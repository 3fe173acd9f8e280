"""spark-submit entry: run BM25 top-k queries against a built index.

Usage:
  spark-submit --py-files engine.zip scripts/query_job.py \
      --index-dir /path/to/index --query "spark shuffle" [--k 10] \
      [--conjunctive] [--queries-tsv file.tsv] [--out results_parquet]

--queries-tsv: lines of "query_id<TAB>query_text<TAB>k" (the reference query
set format, FIXTURES.md §A).
"""

from __future__ import annotations

import argparse
import os
import sys

# local direct invocation (no spark-submit --py-files): repo root on path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-tsv", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--out", default=None, help="write results parquet here")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from opensearch_loader_spark.session import get_spark

        spark = get_spark("osls-query-job")

    from opensearch_loader_spark.query_engine import search

    if args.queries_tsv:
        qs = []
        with open(args.queries_tsv) as f:
            for line in f:
                if not line.strip():
                    continue
                parts = line.rstrip("\n").split("\t")
                qs.append((parts[0], parts[1], int(parts[2]) if len(parts) > 2 else args.k))
    elif args.query:
        qs = [("q0", args.query, args.k)]
    else:
        raise SystemExit("need --query or --queries-tsv")

    res = search(spark, args.index_dir, qs, conjunctive=args.conjunctive,
                 hydrate=True)
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
    else:
        for r in res.orderBy("query_id", "rank").collect():
            print(f"{r['query_id']}\t{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}\t{r['url']}")


if __name__ == "__main__":
    main()
