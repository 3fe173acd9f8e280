"""Hydration must resolve urls across ALL live segments, not just the newest
(regression: base-segment docs lost their urls pre-compaction)."""

import datetime as dt

from opensearch_loader_spark.corpus import make_corpus_df
from opensearch_loader_spark.indexer import build_index
from opensearch_loader_spark.query_engine import search
from opensearch_loader_spark.streaming.incremental import build_delta_segment


def test_hydrate_across_segments(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, make_corpus_df(spark, 80, seed=9), idx, n_buckets=4)
    ts = dt.datetime(2025, 2, 1, tzinfo=dt.timezone.utc)
    updates = spark.createDataFrame(
        [("https://fresh.example/x", ts, None, "zzfreshtoken the data", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    build_delta_segment(spark, idx, updates, "seg-000001")

    # query hits docs from BOTH segments; every row must carry a url
    res = search(spark, idx, [("q", "the zzfreshtoken", 20)], hydrate=True).collect()
    assert len(res) == 20
    assert all(r["url"] for r in res)
    urls = {r["url"] for r in res}
    assert "https://fresh.example/x" in urls           # delta-segment doc
    assert any(u.startswith("https://site") for u in urls)  # base-segment docs
