"""Structured Streaming ingestion: corpus files → ordered delta segments."""

import datetime as dt
import os

from opensearch_loader_spark.corpus import make_corpus_df
from opensearch_loader_spark.indexer import build_index
from opensearch_loader_spark.query_engine import load_index_info, search
from opensearch_loader_spark.streaming.incremental import stream_corpus_to_segments


def test_stream_ingestion(spark, tmp_path):
    idx = str(tmp_path / "idx")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    build_index(spark, make_corpus_df(spark, 60, seed=5), idx, n_buckets=4)

    # drop two new corpus files into the watched directory
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    batch = spark.createDataFrame(
        [
            (f"https://stream{i}.example/p/{i}", ts, None,
             f"streamed varbyte page number {i}", "en")
            for i in range(8)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    batch.write.mode("overwrite").parquet(src)

    q = stream_corpus_to_segments(spark, src, idx, ckpt, trigger_once=True)
    q.awaitTermination(120)

    info = load_index_info(idx)
    assert info["N"] == 68
    assert len(info["segments"]) == 2
    res = search(spark, idx, [("q", "streamed varbyte", 8)]).collect()
    got = {r["doc_id"] for r in res}
    assert len(got) == 8  # the streamed docs dominate this query

    # restart with same checkpoint: no re-ingestion (exactly-once per batch)
    q2 = stream_corpus_to_segments(spark, src, idx, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert load_index_info(idx)["N"] == 68
