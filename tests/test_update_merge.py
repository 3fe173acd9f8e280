"""Update-merge semantics tests — must match the reference exactly:
{**existing, **updates} field-wise merge (opensearch_client.py:179-187),
doc_as_upsert=False drop-and-count (opensearch_client.py:293-344),
ordered batches (loader.py:645-653)."""

import pytest

from opensearch_loader_spark.operators.update import (
    apply_ordered_updates,
    merge_updates,
)


@pytest.fixture()
def existing(spark):
    return spark.createDataFrame(
        [(1, "alice", "active", 100), (2, "bob", "active", 200), (3, "carol", "idle", 300)],
        "id long, name string, status string, score long",
    )


def test_overwrite_and_preserve(spark, existing):
    updates = spark.createDataFrame(
        [(1, "frozen", None), (3, None, 999)],
        "id long, status string, score long",
    )
    res = merge_updates(existing, updates, "id")
    rows = {r["id"]: r for r in res.merged.collect()}
    assert rows[1]["status"] == "frozen" and rows[1]["score"] == 100
    assert rows[1]["name"] == "alice"  # unmentioned field preserved
    assert rows[3]["status"] == "idle" and rows[3]["score"] == 999
    assert rows[2]["status"] == "active"  # untouched doc
    assert res.updated_count == 2 and res.skipped_count == 0


def test_missing_docs_dropped_and_counted(spark, existing):
    updates = spark.createDataFrame(
        [(2, "gone"), (77, "ghost"), (88, "ghost")],
        "id long, status string",
    )
    res = merge_updates(existing, updates, "id")
    ids = {r["id"] for r in res.merged.collect()}
    assert ids == {1, 2, 3}  # no insert (doc_as_upsert=False)
    assert res.updated_count == 1
    assert res.skipped_count == 2


def test_new_column_added(spark, existing):
    updates = spark.createDataFrame([(1, "x@y.z")], "id long, email string")
    res = merge_updates(existing, updates, "id")
    rows = {r["id"]: r for r in res.merged.collect()}
    assert rows[1]["email"] == "x@y.z"
    assert rows[2]["email"] is None


def test_ordered_batches_later_wins(spark, existing):
    b1 = spark.createDataFrame([(1, "s1")], "id long, status string")
    b2 = spark.createDataFrame([(1, "s2")], "id long, status string")
    final, results = apply_ordered_updates(existing, [b1, b2], "id")
    rows = {r["id"]: r for r in final.collect()}
    assert rows[1]["status"] == "s2"
    assert [r.updated_count for r in results] == [1, 1]
