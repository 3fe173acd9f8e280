"""Round-5 regression tests: delta path unified onto the single-pass packer,
Jaccard length-ratio prefilter, pointer-jumping connected components, and the
zero-length-segment codec guard (VERDICT r4 items 3/4/8 + ADVICE r4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestZeroLengthSegments:
    def test_delta_decode_segments_zero_length(self):
        """A zero-length segment must contribute nothing and must NOT corrupt
        the next segment's prior (ADVICE r4: the old indexing read the grand
        total as the prior when a previous end was 0)."""
        from opensearch_loader_spark.functions.varbyte import (
            delta_decode_segments,
            delta_encode_segments,
        )

        vals = np.array([5, 9, 20, 3, 7], dtype=np.uint64)
        # segments: [5,9,20], [], [3,7]  → starts [0, 3, 3], lengths [3, 0, 2]
        starts = np.array([0, 3, 3], dtype=np.int64)
        lengths = np.array([3, 0, 2], dtype=np.int64)
        gaps = delta_encode_segments(vals, starts)
        out = delta_decode_segments(gaps, lengths)
        assert out.tolist() == vals.tolist()

    def test_leading_zero_length_segment(self):
        from opensearch_loader_spark.functions.varbyte import (
            delta_decode_segments,
        )

        # gaps for segments [], [10, +2] → absolute [10, 12]
        gaps = np.array([10, 2], dtype=np.uint64)
        out = delta_decode_segments(gaps, np.array([0, 2], dtype=np.int64))
        assert out.tolist() == [10, 12]


class TestDeltaUnifiedPacker:
    def test_delta_blocks_content_identical_to_row_shuffle_path(
        self, spark, tmp_path
    ):
        """The delta segment built through the single-pass partial-run path
        must decode to exactly the postings the round-3 row-shuffle path
        produced (same (term, doc, tf, dl) set — run assignment semantics
        are identical, doc_id % n_splits, so blocks match per (term, run))."""
        import os

        from opensearch_loader_spark.corpus import make_corpus_df
        from opensearch_loader_spark.functions.varbyte import (
            varbyte_decode,
        )
        from opensearch_loader_spark.indexer import build_index
        from opensearch_loader_spark.streaming.incremental import (
            build_delta_segment,
        )

        base = make_corpus_df(spark, n_docs=120, seed=7)
        idx = str(tmp_path / "idx")
        build_index(spark, base, idx, n_buckets=4, block_size=16,
                    rows_per_run=40)
        # delta: 30 updated urls (re-index) + 10 new urls
        upd = make_corpus_df(spark, n_docs=40, seed=99).withColumn(
            "url",
            F.when(
                F.col("url").isNotNull(),
                F.concat(F.lit("delta-"), F.col("url")),
            ),
        )
        # make 30 of them collide with existing urls
        existing_urls = [r["url"] for r in base.select("url").limit(30).collect()]
        upd_rows = upd.collect()
        import datetime as dt

        rows = []
        for i, r in enumerate(upd_rows):
            d = r.asDict()
            if i < 30:
                d["url"] = existing_urls[i]
            d["warc_ts"] = d["warc_ts"] + dt.timedelta(days=365)
            rows.append(d)
        updates = spark.createDataFrame(rows, schema=base.schema)
        man = build_delta_segment(
            spark, idx, updates, segment="seg-delta-r5", rows_per_run=40
        )
        assert man["updated"] == 30 and man["inserted"] == 10

        # decode the delta blocks → postings set
        seg = os.path.join(idx, "segments", "seg-delta-r5")
        blocks = spark.read.parquet(os.path.join(seg, "postings")).collect()
        got = set()
        for b in blocks:
            gaps = varbyte_decode(bytes(b["doc_gaps"]))
            docs = np.cumsum(gaps, dtype=np.uint64)
            tfs = varbyte_decode(bytes(b["tfs"]))
            dls = varbyte_decode(bytes(b["dls"]))
            for d, t, l in zip(docs, tfs, dls):
                got.add((b["term"], int(d), int(t), int(l)))

        # expected postings from the plain row-level tokenizer over the
        # delta segment's own docs table (the old path's input)
        from opensearch_loader_spark.indexer import tokenize_postings

        delta_docs = spark.read.parquet(os.path.join(seg, "docs"))
        exp = {
            (r["term"], r["doc_id"], r["tf"], r["dl"])
            for r in tokenize_postings(delta_docs).collect()
        }
        assert got == exp

    def test_delta_head_terms_split_into_runs(self, spark, tmp_path):
        """A big-enough delta must exercise the sampled plan: head terms
        split into >1 run in the delta segment too."""
        import os

        from opensearch_loader_spark.corpus import make_corpus_df
        from opensearch_loader_spark.indexer import build_index
        from opensearch_loader_spark.streaming.incremental import (
            build_delta_segment,
        )

        base = make_corpus_df(spark, n_docs=60, seed=3)
        idx = str(tmp_path / "idx2")
        build_index(spark, base, idx, n_buckets=4, block_size=16,
                    rows_per_run=40)
        updates = make_corpus_df(spark, n_docs=150, seed=4).withColumn(
            "url", F.concat(F.lit("new-"), F.col("url"))
        )
        build_delta_segment(
            spark, idx, updates, segment="seg-delta-big", rows_per_run=40
        )
        seg = os.path.join(idx, "segments", "seg-delta-big")
        runs = (
            spark.read.parquet(os.path.join(seg, "postings"))
            .select("term", "run").distinct()
            .groupBy("term").count().filter(F.col("count") > 1).count()
        )
        assert runs > 0, "head terms should split into multiple runs"


class TestJaccardPrefilter:
    def test_boundary_ratio_pair_kept(self, spark):
        """A pair at exactly J = t (subset, |A|/|B| = t) must survive the
        length-ratio prefilter — the filter is implied by J ≥ t, never
        stricter."""
        from opensearch_loader_spark.operators.dedup import (
            token_jaccard_pairs,
        )

        a = " ".join(f"tok{i}" for i in range(8))
        b = " ".join(f"tok{i}" for i in range(10))  # superset, J = 8/10
        docs = spark.createDataFrame(
            [(0, a), (1, b)], "doc_id long, text string"
        )
        out = token_jaccard_pairs(docs, threshold=0.8).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["doc_a"], r["doc_b"], r["inter"]) == (0, 1, 8)
        assert abs(r["jaccard"] - 0.8) < 1e-9

    def test_ratio_violating_pair_pruned_but_equal_output(self, spark):
        """Docs with wildly different sizes share tokens but can't reach the
        threshold — output must be empty (prefilter and exact check agree)."""
        from opensearch_loader_spark.operators.dedup import (
            token_jaccard_pairs,
        )

        a = " ".join(f"tok{i}" for i in range(5))
        b = " ".join(f"tok{i}" for i in range(50))
        docs = spark.createDataFrame(
            [(0, a), (1, b)], "doc_id long, text string"
        )
        assert token_jaccard_pairs(docs, threshold=0.8).count() == 0


class TestPointerJumpingCC:
    def _chain_docs(self, spark, n):
        # doc i = tokens {i..i+9}: J(i, i+1) = 9/11 ≈ 0.818 ≥ 0.8,
        # J(i, i+2) = 8/12 < 0.8 → a pure CHAIN of length n in the J≥0.8
        # similarity graph (diameter n-1)
        rows = [
            (i, " ".join(f"w{j}" for j in range(i, i + 10))) for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_chain_longer_than_max_iters_converges(self, spark):
        """VERDICT r4 stretch item 8: an adversarial chain graph with
        diameter ≫ max_iters must converge (pointer jumping makes rounds
        O(log diameter)) instead of raising."""
        from opensearch_loader_spark.operators.dedup import dedup_clusters

        docs = self._chain_docs(spark, 40)  # diameter 39 > max_iters=8
        out = dedup_clusters(docs, threshold=0.8, max_iters=8).collect()
        assert len(out) == 40
        assert {r["rep_id"] for r in out} == {0}

    def test_two_components_reps(self, spark):
        from opensearch_loader_spark.operators.dedup import dedup_clusters

        a = self._chain_docs(spark, 12)
        b = spark.createDataFrame(
            [
                (100 + i, " ".join(f"z{j}" for j in range(i, i + 10)))
                for i in range(12)
            ],
            "doc_id long, text string",
        )
        out = dedup_clusters(a.unionByName(b), threshold=0.8, max_iters=8)
        reps = {r["doc_id"]: r["rep_id"] for r in out.collect()}
        assert all(reps[i] == 0 for i in range(12))
        assert all(reps[100 + i] == 100 for i in range(12))


class TestSkewPlanGuard:
    def test_manifest_records_run_posting_bound(self, spark, tiny_index):
        """build_index manifests must carry the skew-plan observability
        fields (ADVICE r4): max postings in any (term, run) and the count of
        runs blowing past 4× rows_per_run."""
        _, manifest = tiny_index
        assert "max_run_postings" in manifest
        assert "runs_over_4x_target" in manifest
        assert manifest["max_run_postings"] > 0
        # tiny fixture: plan is exact-ish, nothing should blow 4× the target
        assert manifest["runs_over_4x_target"] == 0
