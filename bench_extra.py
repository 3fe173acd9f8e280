"""Round-6 isolation bench (guide §1.4): per-query noop-sink timings, index
build stage decomposition, and search-call latency — WITHOUT touching the
frozen bench.py. Prints one JSON line.

Usage: python bench_extra.py [query ...]   (default: the full suite)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    only = set(sys.argv[1:])
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entrymod
    from opensearch_loader_spark.indexer import build_index
    from opensearch_loader_spark.query_engine import search
    from opensearch_loader_spark.session import get_spark
    from opensearch_loader_spark.sources.catalog import documents_as_corpus

    spark = get_spark("osls-bench-extra", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict = {"sf_dir": sf_dir, "cores": cores, "reps": reps}

    def timed(name, fn, n=reps):
        samples = []
        for _ in range(n):
            sc.setJobDescription(name)
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"p50": statistics.median(samples), "samples": samples}
        print(f"  {name}: {out[name]}", file=sys.stderr)

    # ---- index build (stage decomposition from the manifest) ----
    if not only or "index_build" in only:
        corpus = documents_as_corpus(spark, sf_dir)
        corpus.count()
        builds = []
        for _ in range(reps):
            idx_dir = tempfile.mkdtemp(prefix="osls_bx_idx_")
            sc.setJobDescription("index_build")
            t0 = time.time()
            m = build_index(
                spark, corpus, idx_dir, n_buckets=max(16, cores),
                block_size=128, rows_per_run=100_000,
            )
            builds.append(
                {"secs": round(time.time() - t0, 3), "stage_secs": m["stage_secs"]}
            )
            shutil.rmtree(idx_dir, ignore_errors=True)
        sc.setJobDescription(None)
        out["index_build"] = builds
        print(f"  index_build: {builds}", file=sys.stderr)

    # ---- search latency (the bench's own index params) ----
    if not only or "search" in only:
        idx_dir = tempfile.mkdtemp(prefix="osls_bx_sidx_")
        corpus = documents_as_corpus(spark, sf_dir)
        build_index(
            spark, corpus, idx_dir, n_buckets=max(16, cores), block_size=128,
            rows_per_run=100_000,
        )
        timed(
            "search_head",
            lambda: search(spark, idx_dir, [("q", "the", 10)]).collect(),
            n=max(reps, 5),
        )
        timed(
            "search_multi",
            lambda: search(spark, idx_dir, [("q", "spark hash merge", 10)]).collect(),
            n=max(reps, 5),
        )
        timed(
            "search_filtered",
            lambda: search(
                spark, idx_dir, [("q", "spark hash merge", 10)],
                doc_filter="lang = 'en'",
            ).collect(),
            n=max(reps, 5),
        )
        shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- declared queries, noop-sink isolated ----
    queries = entrymod.queries()
    default_qs = [
        "tokenize_tf", "bm25_topk", "agg_pricing_summary", "join_top_customers",
        "embedding_cosine_topk", "dedup_exact", "quality_score", "update_merge",
        "ann_lsh_topk", "simhash", "minhash_lsh_pairs",
        "token_jaccard_pairs", "shingle_jaccard_pairs", "dedup_clusters",
    ]
    for name in default_qs:
        if only and name not in only:
            continue
        qfn = queries[name]
        timed(
            name,
            lambda qfn=qfn: qfn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
