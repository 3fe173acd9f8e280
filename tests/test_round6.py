"""Round-6 optimization regression tests: per-bucket LSH pair enumeration
(first-shared-band uniqueness, join-reference equality), vocabulary-adaptive
Jaccard verify (bitmask ≡ general path), dedup folded into the docID
assignment sort, the skew-plan early-out, the trailing-empty-segment encode
guard (ADVICE r5), and search-plan reuse."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _reference_band_pairs(signatures, n_hashes, rows_per_band):
    """The pre-round-6 formulation: band columns → self-join on (band,
    bucket) → distinct. Ground truth for the candidate-pair SET."""
    n_bands = n_hashes // rows_per_band
    bands = None
    for i in range(n_bands):
        cols = [
            f"sig_{j}" for j in range(i * rows_per_band, (i + 1) * rows_per_band)
        ]
        b = signatures.select(
            "doc_id", F.lit(i).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("bucket"),
        )
        bands = b if bands is None else bands.unionByName(b)
    left = bands.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    right = bands.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


class TestBandPairs:
    def _signatures(self, spark, n_docs=40, n_hashes=8):
        """Signatures with deliberate collisions: docs in the same template
        group share most sig columns, so buckets collide across bands."""
        rows = []
        for d in range(n_docs):
            grp = d % 5
            sigs = [
                f"g{grp}-s{i}" if (d + i) % 3 else f"d{d}-s{i}"
                for i in range(n_hashes)
            ]
            rows.append((d, *sigs))
        cols = "doc_id long, " + ", ".join(
            f"sig_{i} string" for i in range(n_hashes)
        )
        return spark.createDataFrame(rows, cols)

    def test_pair_set_matches_join_reference_and_is_unique(self, spark):
        from opensearch_loader_spark.operators.dedup import _band_pairs

        sigs = self._signatures(spark)
        got = _band_pairs(sigs, 8, 2).collect()
        got_pairs = [(r["doc_a"], r["doc_b"]) for r in got]
        # emitted exactly once per pair (first-shared-band guarantee): the
        # old path needed a distinct; the new one must not produce dups
        assert len(got_pairs) == len(set(got_pairs))
        want = {
            (r["doc_a"], r["doc_b"])
            for r in _reference_band_pairs(sigs, 8, 2).collect()
        }
        assert set(got_pairs) == want
        for a, b in got_pairs:
            assert a < b

    def test_ratio_prefilter_only_drops_ratio_violations(self, spark):
        """threshold + n_sh in the signatures: output = reference pairs minus
        exactly those violating min >= t*max."""
        from opensearch_loader_spark.operators.dedup import _band_pairs

        sigs = self._signatures(spark)
        # deterministic fake set sizes: doc_id-dependent spread
        sized = sigs.withColumn(
            "n_sh", (F.lit(10) + F.pmod(F.col("doc_id"), F.lit(7)) * 3).cast("long")
        )
        t = 0.8
        got = {
            (r["doc_a"], r["doc_b"])
            for r in _band_pairs(sized, 8, 2, threshold=t).collect()
        }
        sizes = {r["doc_id"]: r["n_sh"] for r in sized.collect()}
        want = {
            (a, b)
            for (a, b) in (
                (r["doc_a"], r["doc_b"])
                for r in _reference_band_pairs(sigs, 8, 2).collect()
            )
            if min(sizes[a], sizes[b]) >= t * max(sizes[a], sizes[b])
        }
        assert got == want


class TestAdaptiveJaccardVerify:
    def test_bitmask_path_equals_general_path(self, spark):
        """The small-vocab bitmask verify and the large-vocab array verify
        must produce identical rows for the same input."""
        import opensearch_loader_spark.operators.dedup as dd

        rows = [
            (0, "the quick brown fox jumps over a lazy dog"),
            (1, "the quick brown fox jumps over a lazy cat"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "completely different tokens here entirely now"),
            (4, "the quick brown fox jumps over the lazy dog today"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        def run():
            return sorted(
                tuple(r) for r in dd.token_jaccard_pairs(
                    docs, threshold=0.5
                ).collect()
            )

        small_max = dd._BITMASK_VOCAB_MAX
        try:
            got_bitmask = run()          # vocab ~15 → bitmask path
            dd._BITMASK_VOCAB_MAX = 0    # force the general (array UDF) path
            got_general = run()
        finally:
            dd._BITMASK_VOCAB_MAX = small_max
        assert got_bitmask == got_general
        assert len(got_bitmask) > 0  # docs 0/2 are identical → J=1 pair

    def test_multi_chunk_bitmask(self, spark):
        """>64 vocab items exercise the multi-long mask chunks."""
        import opensearch_loader_spark.operators.dedup as dd

        vocab = [f"w{i:03d}" for i in range(150)]
        rows = [
            (0, " ".join(vocab[0:100])),
            (1, " ".join(vocab[0:95])),   # J = 95/100
            (2, " ".join(vocab[40:140])),
            (3, " ".join(vocab[0:100])),  # J = 1 with doc 0
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dd.token_jaccard_pairs(docs, threshold=0.9).collect()
        }
        assert got[(0, 3)] == 1.0
        assert got[(0, 1)] == 0.95
        assert (0, 2) not in got  # J = 60/140 << 0.9


class TestPrepareDocsDedupInAssign:
    def test_duplicate_urls_last_writer_wins_with_deterministic_ties(
        self, spark
    ):
        """Dedup now happens inside the sorted assignment pass; the survivor
        must be the max(struct(warc_ts, text, lang, sha)) row the old
        hash-agg picked, docIDs dense and url-ordered over the SURVIVORS."""
        from opensearch_loader_spark.indexer import prepare_docs

        rows = [
            ("u://a", "2024-01-01 00:00:00", None, "early text", "en"),
            ("u://a", "2024-01-03 00:00:00", None, "late text", "en"),
            # u://b: timestamp TIE → lexicographically larger text wins
            ("u://b", "2024-01-02 00:00:00", None, "tie aaa", "en"),
            ("u://b", "2024-01-02 00:00:00", None, "tie zzz", "en"),
            ("u://c", "2024-01-01 00:00:00", None, "only one", "de"),
        ]
        corpus = spark.createDataFrame(
            rows, "url string, warc_ts_s string, html binary, text string, lang string"
        ).selectExpr(
            "url", "CAST(warc_ts_s AS TIMESTAMP) AS warc_ts", "html", "text", "lang"
        )
        docs = {r["url"]: r for r in prepare_docs(corpus).collect()}
        assert len(docs) == 3
        assert docs["u://a"]["text"] == "late text"
        assert docs["u://b"]["text"] == "tie zzz"
        assert docs["u://c"]["text"] == "only one"
        assert sorted(r["doc_id"] for r in docs.values()) == [0, 1, 2]
        assert docs["u://a"]["doc_id"] < docs["u://b"]["doc_id"] < docs["u://c"]["doc_id"]

    def test_docids_invariant_to_partition_count_with_dups(self, spark):
        from opensearch_loader_spark.indexer import prepare_docs

        rows = []
        for i in range(300):
            rows.append((f"u://{i:04d}", "2024-01-01 00:00:00", None, f"text {i}", "en"))
            if i % 7 == 0:  # duplicates for every 7th url
                rows.append((f"u://{i:04d}", "2024-01-02 00:00:00", None, f"newer {i}", "en"))
        corpus = spark.createDataFrame(
            rows, "url string, warc_ts_s string, html binary, text string, lang string"
        ).selectExpr(
            "url", "CAST(warc_ts_s AS TIMESTAMP) AS warc_ts", "html", "text", "lang"
        )
        a = {r["url"]: r["doc_id"] for r in prepare_docs(corpus, id_partitions=3).collect()}
        b = {r["url"]: r["doc_id"] for r in prepare_docs(corpus, id_partitions=64).collect()}
        assert a == b
        assert sorted(a.values()) == list(range(300))


class TestSkewPlanEarlyOut:
    def test_small_corpus_returns_empty_plan(self, spark, tiny_corpus):
        from opensearch_loader_spark.indexer import prepare_docs, sampled_skew_plan

        docs = prepare_docs(tiny_corpus)
        # 200 docs * 1.2 margin <= 100_000 rows_per_run → provably empty
        assert sampled_skew_plan(docs, 200, 100_000) == {}

    def test_large_rows_still_plans(self, spark, tiny_corpus):
        """rows_per_run below n_docs·margin must still run the sampled plan
        (head terms split) — the early-out must not over-trigger."""
        from opensearch_loader_spark.indexer import prepare_docs, sampled_skew_plan

        docs = prepare_docs(tiny_corpus)
        plan = sampled_skew_plan(docs, 200, 40)
        assert plan  # the synthetic corpus has head terms with df >> 40
        assert all(v > 1 for v in plan.values())


class TestVarbyteTrailingEmptySegment:
    def test_encode_tolerates_trailing_empty_segment(self):
        """ADVICE r5: encode crashed when a trailing zero-length segment put
        a seg_start AT len(values); decode was already hardened."""
        from opensearch_loader_spark.functions.varbyte import (
            delta_decode_segments,
            delta_encode_segments,
        )

        vals = np.array([2, 5, 11, 3, 4], dtype=np.uint64)
        starts = np.array([0, 3, 5], dtype=np.int64)  # last segment empty
        lengths = np.array([3, 2, 0], dtype=np.int64)
        gaps = delta_encode_segments(vals, starts)  # must not raise
        assert delta_decode_segments(gaps, lengths).tolist() == vals.tolist()


class TestTaatWandIdentity:
    def _term_blocks(self, n_docs=5000, seed=3):
        """Real emit_blocks output for synthetic zipf-ish postings: several
        terms with overlapping doc sets, multiple runs for one term."""
        from opensearch_loader_spark.indexer import emit_blocks

        rng = np.random.default_rng(seed)
        avgdl = 40.0
        tb = {}
        dfs = {}
        for term, df, runs in [
            ("alpha", 3000, 1), ("beta", 1200, 2), ("gamma", 150, 1)
        ]:
            docs = np.sort(
                rng.choice(n_docs, size=df, replace=False)
            ).astype(np.uint64)
            tfs = rng.integers(1, 9, size=df).astype(np.uint64)
            dls = rng.integers(10, 90, size=df).astype(np.uint64)
            runs_list = []
            for r in range(runs):
                m = (docs % runs) == r
                rows = emit_blocks(
                    term, r, docs[m], tfs[m], dls[m], avgdl, block_size=64
                )
                blocks = [
                    (row[3], row[4], row[6], row[7], row[8], row[9])
                    for row in rows
                ]
                runs_list.append((blocks, None))
            tb[term] = runs_list
            dfs[term] = df
        return tb, dfs, n_docs, avgdl

    def test_taat_identical_to_wand_all_masks(self):
        """taat_topk must be bit-identical to the Python block-max WAND —
        scores, ranking, tie-breaks — under doc_range and allowed masks."""
        from opensearch_loader_spark.query_engine import bmw_topk, taat_topk
        import opensearch_loader_spark.query_engine as qe

        tb, dfs, n_docs, avgdl = self._term_blocks()
        allowed_ids = np.arange(0, n_docs, 3, dtype=np.int64)
        size = (n_docs + 8) // 8
        bm = np.zeros(size, np.uint8)
        np.bitwise_or.at(
            bm, allowed_ids >> 3, (1 << (allowed_ids & 7)).astype(np.uint8)
        )
        cases = [
            dict(),
            dict(doc_range=(1000, 4000)),
            dict(allowed=(0, bm.tobytes())),
            dict(doc_range=(500, 4500), allowed=(0, bm.tobytes())),
        ]
        old = qe.TAAT_MIN_GAP_BYTES
        try:
            for k in (5, 10, 100):
                for kw in cases:
                    qe.TAAT_MIN_GAP_BYTES = 1 << 60  # force the WAND loop
                    w = bmw_topk(tb, dfs, n_docs, avgdl, k, **kw)
                    t = taat_topk(tb, dfs, n_docs, avgdl, k, **kw)
                    assert w == t, (k, kw)
                    assert len(w) == min(k, len(w))
        finally:
            qe.TAAT_MIN_GAP_BYTES = old

    def test_dispatch_threshold(self):
        """bmw_topk must route to TAAT above the gap-byte threshold and
        still produce the same result."""
        import opensearch_loader_spark.query_engine as qe

        tb, dfs, n_docs, avgdl = self._term_blocks()
        old = qe.TAAT_MIN_GAP_BYTES
        try:
            qe.TAAT_MIN_GAP_BYTES = 1 << 60
            w = qe.bmw_topk(tb, dfs, n_docs, avgdl, 10)
            qe.TAAT_MIN_GAP_BYTES = 0
            t = qe.bmw_topk(tb, dfs, n_docs, avgdl, 10)
        finally:
            qe.TAAT_MIN_GAP_BYTES = old
        assert w == t


class TestSearchPlanReuse:
    def test_blocks_union_cached_per_reader_and_results_stable(
        self, spark, tiny_index
    ):
        from opensearch_loader_spark.query_engine import get_reader, search

        d, _ = tiny_index
        r1 = search(spark, d, [("q", "the data", 5)]).collect()
        reader = get_reader(spark, d)
        df_a = reader.blocks_union(spark)
        r2 = search(spark, d, [("q", "the data", 5)]).collect()
        df_b = get_reader(spark, d).blocks_union(spark)
        assert df_a is df_b  # plan object reused, no re-listing
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))

    def test_plan_cache_reuses_identical_queries_and_invalidates_on_rebuild(
        self, spark, tiny_index
    ):
        """Identical repeated searches must reuse the compiled plan (same
        DataFrame object); any index MANIFEST change must invalidate it.
        Different queries/flags must never share a plan."""
        import os
        import time

        from opensearch_loader_spark.query_engine import search

        d, _ = tiny_index
        a = search(spark, d, [("q", "the data", 5)])
        b = search(spark, d, [("q", "the data", 5)])
        assert a is b
        c = search(spark, d, [("q", "the data", 7)])
        assert c is not a
        e = search(spark, d, [("q", "the data", 5)], conjunctive=True)
        assert e is not a
        # touch the MANIFEST (what every build/delta/compaction rewrite
        # does) → fingerprint changes → fresh plan, same results
        top = os.path.join(d, "MANIFEST.json")
        now = time.time() + 2
        os.utime(top, (now, now))
        f = search(spark, d, [("q", "the data", 5)])
        assert f is not a
        assert sorted(map(tuple, f.collect())) == sorted(
            map(tuple, a.collect())
        )
