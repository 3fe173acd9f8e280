"""Round-4 regression tests: scale-safe pid assignment, sampled skew plan,
map-side partial packing, sharded compaction bitmaps (VERDICT r3 items)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestPidColumn:
    def test_udf_matches_chained_expr(self, spark):
        """pid via np.searchsorted (large boundary lists) must be identical
        to the chained-when expression (small lists) — including unicode
        urls, exact-boundary hits, and urls below the first boundary."""
        from opensearch_loader_spark.indexer import _pid_column

        rng = np.random.default_rng(7)
        urls = [
            f"https://{rng.integers(0, 10**6):06d}.example.com/p{i}"
            for i in range(2000)
        ]
        urls += ["https://zzz.test/ünïcode", "https://ÿ.test/a", "a", "zzzzz"]
        boundaries = sorted({u for u in urls[:: len(urls) // 100]})[:100]
        # include an exact boundary value among probed urls
        urls.append(boundaries[3])
        df = spark.createDataFrame([(u,) for u in urls], "url string")

        assert len(boundaries) > 32  # forces the UDF path
        got_udf = {
            r["url"]: r["pid"]
            for r in df.withColumn("pid", _pid_column(boundaries)).collect()
        }
        # reference: the chained expression evaluated in slices of ≤32
        # boundaries: pid = Σ_slices #(slice boundaries ≤ url)
        expr = F.lit(0)
        for b in boundaries:
            expr = expr + F.when(F.col("url") >= F.lit(b), 1).otherwise(0)
        got_expr = {
            r["url"]: r["pid"]
            for r in df.withColumn("pid", expr.cast("int")).collect()
        }
        assert got_udf == got_expr

    def test_docids_invariant_to_partition_count(self, spark, tiny_corpus):
        """docIDs are the global url rank — identical for ANY boundary set,
        including an n_part large enough to force the searchsorted path."""
        from opensearch_loader_spark.indexer import prepare_docs

        a = {
            r["url"]: r["doc_id"]
            for r in prepare_docs(tiny_corpus, id_partitions=4)
            .select("url", "doc_id").collect()
        }
        b = {
            r["url"]: r["doc_id"]
            for r in prepare_docs(tiny_corpus, id_partitions=2048)
            .select("url", "doc_id").collect()
        }
        assert a == b
        # dense, url-ordered
        ordered = sorted(a)
        assert [a[u] for u in ordered] == list(range(len(ordered)))
