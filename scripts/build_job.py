"""spark-submit entry: build (or resume) the inverted index.

Usage (cluster):
  zip -r engine.zip opensearch_loader_spark
  spark-submit --py-files engine.zip scripts/build_job.py \
      --corpus /path/to/pages_parquet --index-dir /path/to/index \
      [--segment seg-000000] [--n-buckets 1024] [--rows-per-run 2000000] \
      [--resume] [--lang en] [--since 2024-01-01T00:00:00]

Local sandbox: python scripts/build_job.py --corpus ... --index-dir ...
(creates its own local session when spark-submit didn't provide one).

The --lang/--since filters are the engine-side analogue of the reference's
parameterized Cypher WHERE clauses (indices.example.yaml:29-31) — plain
pushed-down DataFrame filters here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local direct invocation (no spark-submit --py-files): repo root on path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet dir/file of pages")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--segment", default="seg-000000")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--rows-per-run", type=int, default=1_000_000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--lang", default=None)
    ap.add_argument("--since", default=None, help="min warc_ts ISO timestamp")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        from opensearch_loader_spark.session import get_spark

        spark = get_spark("osls-build-job")

    from opensearch_loader_spark.indexer import build_index

    corpus = spark.read.parquet(args.corpus)
    if args.lang:
        corpus = corpus.filter(F.col("lang") == args.lang)
    if args.since:
        corpus = corpus.filter(F.col("warc_ts") >= F.lit(args.since).cast("timestamp"))

    manifest = build_index(
        spark,
        corpus,
        args.index_dir,
        segment=args.segment,
        n_buckets=args.n_buckets,
        block_size=args.block_size,
        rows_per_run=args.rows_per_run,
        resume=args.resume,
    )
    json.dump(manifest, sys.stdout)
    print()


if __name__ == "__main__":
    main()
