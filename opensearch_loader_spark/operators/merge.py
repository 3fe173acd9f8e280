"""Log-structured sorted-run merge — segment compaction (north rule).

Each build/update emits a sorted segment under ``index_dir/segments/``.
Compaction k-way-merges all live segments per term into one new segment:

- decode every segment's blocks per (term) group,
- NEWEST SEGMENT WINS per (term, doc_id) — update shadowing: a doc
  re-indexed in a newer segment replaces its older postings, and a
  tombstone (doc present in newer docs table) suppresses terms the doc no
  longer contains,
- re-sort by doc_id, re-encode delta-gap+varbyte blocks with fresh
  block-max metadata.

Spark shape: ``unionByName`` of per-segment block tables →
``groupBy(term, run).applyInPandas(merge)`` (SURVEY.md §4.2.3). Doc-level
shadowing is resolved with a broadcast set of doc_ids that exist in newer
segments ("reindexed docs"): postings for those doc_ids are dropped from
older segments wholesale, then the newer segments' postings are taken as-is.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from opensearch_loader_spark import BLOCK_SIZE
from opensearch_loader_spark.indexer import BLOCK_SCHEMA, with_bucket
from opensearch_loader_spark.query_engine import load_index_info


def _make_merger(
    avgdl: float,
    block_size: int,
    newest_rank: dict[str, int],
    shadow_by_segment: dict[str, "np.ndarray | None"],
):
    from opensearch_loader_spark import BM25_B, BM25_K1
    from opensearch_loader_spark.functions.varbyte import (
        delta_decode,
        delta_encode,
        varbyte_decode,
        varbyte_encode,
    )

    k1, b = BM25_K1, BM25_B

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        # decode all blocks from all segments; TOMBSTONE shadowing first: a
        # doc re-indexed by a newer segment invalidates ALL its postings in
        # older segments — including for terms the new text no longer
        # contains (which newest-wins-per-(term,doc) alone would miss)
        doc_ids, tfs, dls, ranks = [], [], [], []
        for row in pdf.itertuples(index=False):
            d = delta_decode(varbyte_decode(bytes(row.doc_gaps))).astype(np.int64)
            t = varbyte_decode(bytes(row.tfs)).astype(np.int64)
            l = varbyte_decode(bytes(row.dls)).astype(np.int64)
            shadow = shadow_by_segment.get(row.segment)
            if shadow is not None and len(shadow):
                keep = ~np.isin(d, shadow)
                d, t, l = d[keep], t[keep], l[keep]
            if len(d) == 0:
                continue
            doc_ids.append(d)
            tfs.append(t)
            dls.append(l)
            ranks.append(np.full(len(d), newest_rank[row.segment], dtype=np.int64))
        if not doc_ids:
            return pd.DataFrame(columns=[f.name for f in BLOCK_SCHEMA.fields])
        docs = np.concatenate(doc_ids)
        tf = np.concatenate(tfs)
        dl = np.concatenate(dls)
        rk = np.concatenate(ranks)
        # newest wins per doc (belt-and-braces; shadowing already removed
        # re-indexed docs from older segments)
        order = np.lexsort((-rk, docs))
        docs, tf, dl = docs[order], tf[order], dl[order]
        keep = np.ones(len(docs), dtype=bool)
        keep[1:] = docs[1:] != docs[:-1]
        docs, tf, dl = docs[keep], tf[keep], dl[keep]

        rows = []
        for blk_i, start in enumerate(range(0, len(docs), block_size)):
            d = docs[start : start + block_size].astype(np.uint64)
            t = tf[start : start + block_size].astype(np.uint64)
            l = dl[start : start + block_size].astype(np.uint64)
            tff, dlf = t.astype(np.float64), l.astype(np.float64)
            part = (tff * (k1 + 1.0)) / (tff + k1 * (1.0 - b + b * dlf / avgdl))
            rows.append(
                (
                    term, 0, blk_i, int(d[0]), int(d[-1]), len(d),
                    float(part.max()),
                    varbyte_encode(delta_encode(d)),
                    varbyte_encode(t),
                    varbyte_encode(l),
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return merge


def compact_segments(
    spark: SparkSession,
    index_dir: str,
    out_segment: str = "seg-merged",
    block_size: int = BLOCK_SIZE,
) -> dict:
    """K-way merge all live segments into one; replaces MANIFEST segment list.

    Doc-level shadowing: the merged docs table keeps, per url, the row from
    the newest segment (docID stability: docIDs are global across segments —
    updates reuse the same docID via the url→docID map, see
    incremental.build_delta_segment).
    """
    import numpy as np

    info = load_index_info(index_dir)
    segs = [m["segment"] for m in info["segments"]]
    if len(segs) < 2:
        return {"merged": False, "reason": "single segment"}
    newest_rank = {s: i for i, s in enumerate(segs)}  # later = newer

    # per-segment tombstones: doc_ids re-indexed by any NEWER segment
    upd: dict[str, np.ndarray] = {}
    for s in segs[1:]:
        p = os.path.join(index_dir, "segments", s, "updated_ids")
        if os.path.isdir(p):
            rows = spark.read.parquet(p).collect()
            if rows:
                upd[s] = np.sort(np.array([r["doc_id"] for r in rows], np.int64))
    shadow_by_segment: dict[str, np.ndarray | None] = {}
    for i, s in enumerate(segs):
        newer = [upd[x] for x in segs[i + 1:] if x in upd]
        shadow_by_segment[s] = np.unique(np.concatenate(newer)) if newer else None

    # merged docs table: newest segment wins per doc_id
    docs_parts = []
    for i, s in enumerate(segs):
        p = os.path.join(index_dir, "segments", s, "docs")
        docs_parts.append(spark.read.parquet(p).withColumn("_rank", F.lit(i)))
    all_docs = docs_parts[0]
    for d in docs_parts[1:]:
        all_docs = all_docs.unionByName(d)
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("_rank"))
    merged_docs = (
        all_docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_rank")
    )

    stats = merged_docs.agg(
        F.count("*").alias("N"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    N, avgdl = int(stats["N"]), float(stats["avgdl"])

    blocks_parts = []
    for s in segs:
        p = os.path.join(index_dir, "segments", s, "postings")
        blocks_parts.append(
            spark.read.parquet(p).withColumn("segment", F.lit(s))
        )
    all_blocks = blocks_parts[0]
    for bdf in blocks_parts[1:]:
        all_blocks = all_blocks.unionByName(bdf)

    merged = (
        all_blocks.repartition(
            spark.sparkContext.defaultParallelism, "term"
        )
        .groupBy("term")
        .applyInPandas(
            _make_merger(avgdl, block_size, newest_rank, shadow_by_segment),
            BLOCK_SCHEMA,
        )
    )
    merged = with_bucket(merged, info["n_buckets"])

    out_dir = os.path.join(index_dir, "segments", out_segment)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "postings")
    )
    merged_docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))

    written = spark.read.parquet(os.path.join(out_dir, "postings"))
    term_stats = (
        written.groupBy("term")
        .agg(F.sum("n_docs").cast("long").alias("df"))
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(info["n_buckets"])).cast("int"),
        )
    )
    term_stats.write.mode("overwrite").parquet(os.path.join(out_dir, "term_stats"))

    manifest = {
        "segment": out_segment,
        "snapshot_id": "merge:" + "+".join(
            m["snapshot_id"] for m in info["segments"]
        ),
        "N": N,
        "avgdl": avgdl,
        "n_buckets": info["n_buckets"],
        "block_size": block_size,
        "complete": True,
        "merged_from": segs,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # atomic visibility flip (reference analogue: refresh-after-bulk,
    # loader.py:643,657): queries read the manifest, so updating it last
    # makes the compaction visible in one step.
    with open(os.path.join(index_dir, "MANIFEST.json"), "w") as f:
        json.dump({"segments": [out_segment], "n_buckets": info["n_buckets"]}, f)
    return manifest
