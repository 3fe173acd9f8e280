"""Update-merge semantics — the reference's incremental path, natively.

Reference behavior being matched:

- ``merge_document`` (opensearch_client.py:168-187): read-modify-write
  ``{**existing, **updates}`` — new values overwrite, unmentioned fields
  are preserved.
- ``bulk_update`` / ``_process_update_batch`` (opensearch_client.py:228-350):
  update actions with ``doc_as_upsert=False`` (:293-299) ⇒ updates whose key
  does not exist are **silently dropped and counted** (:317-344); the
  ``id_field`` is stripped from the update body (:287); empty updates are
  skipped; fixed 5000-doc batches (:245).
- Ordered application of update queries per index (loader.py:645-653).

Spark expression: a left join of existing docs to updates with per-column
``coalesce(update.c, existing.c)`` — exactly the WHEN MATCHED THEN UPDATE arm
of MERGE INTO with no insert arm. Missing-key updates are counted via an
anti-join (the reference's `total_skipped`, opensearch_client.py:335-344).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class UpdateResult:
    merged: DataFrame
    updated_count: int
    skipped_count: int  # updates whose key doesn't exist (doc_as_upsert=False)


def merge_updates(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    count: bool = True,
) -> UpdateResult:
    """Apply one update batch with the reference's exact semantics.

    - columns present in `updates` overwrite when non-null, else preserve
      (``{**existing, **updates}`` where updates carry only changed fields —
      a column absent from the update doc is represented as NULL here)
    - rows in `updates` with keys absent from `existing` are dropped+counted
    - `key` is never modified (reference strips id_field from the body,
      opensearch_client.py:287)
    """
    upd_cols = [c for c in updates.columns if c != key]
    u = updates.select(key, *[F.col(c).alias(f"__u_{c}") for c in upd_cols])

    merged = existing.join(u, key, "left")
    for c in upd_cols:
        if c in existing.columns:
            merged = merged.withColumn(c, F.coalesce(F.col(f"__u_{c}"), F.col(c)))
        else:
            merged = merged.withColumn(c, F.col(f"__u_{c}"))
    merged = merged.drop(*[f"__u_{c}" for c in upd_cols])

    updated = skipped = 0
    if count:
        matched = updates.join(existing.select(key), key, "left_semi").count()
        updated = matched
        skipped = updates.count() - matched
    return UpdateResult(merged=merged, updated_count=updated, skipped_count=skipped)


def apply_ordered_updates(
    existing: DataFrame, update_batches: list[DataFrame], key: str
) -> tuple[DataFrame, list[UpdateResult]]:
    """Sequential ordered update batches (loader.py:645-653 semantics)."""
    results = []
    cur = existing
    for batch in update_batches:
        res = merge_updates(cur, batch, key)
        results.append(res)
        cur = res.merged
    return cur, results
