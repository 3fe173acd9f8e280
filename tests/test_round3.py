"""Round-3 features: exact stats under updates, atomic manifest commits,
single-chunk fast path, query-term dedup, locale-safe JVM tokenizer, BMP
decode, dedup clusters, allowed-bitmap cache."""

import datetime as dt
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_loader_spark.corpus import make_corpus_df
from opensearch_loader_spark.indexer import build_index
from opensearch_loader_spark.oracle import build_oracle_index, oracle_topk
from opensearch_loader_spark.query_engine import load_index_info, search
from opensearch_loader_spark.streaming.incremental import build_delta_segment

TS = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _mk_update(spark, rows):
    return spark.createDataFrame(
        [(u, TS, None, t, "en") for u, t in rows], CORPUS_SCHEMA
    )


@pytest.fixture()
def small_index(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = make_corpus_df(spark, n_docs=120, seed=42)
    build_index(spark, corpus, d, n_buckets=4, block_size=16, rows_per_run=50)
    return d


def _oracle_from_docs(spark, index_dir):
    info = load_index_info(index_dir)
    docs = {}
    for m in info["segments"]:
        p = os.path.join(index_dir, "segments", m["segment"], "docs")
        for r in spark.read.parquet(p).select("doc_id", "text").collect():
            docs[r["doc_id"]] = r["text"]  # later segments overwrite
    return build_oracle_index(docs)


# ----------------------------------------------------- exact stats under update

def test_update_delta_exact_stats_precompaction(spark, small_index):
    """Round-3 (VERDICT item 6): after an in-place UPDATE and WITHOUT
    compaction, df (via df_neg), N and avgdl (via replaced_dl_sum) are
    exact — scores, not just ranks, match the oracle on the merged corpus."""
    docs = spark.read.parquet(
        os.path.join(small_index, "segments", "seg-000000", "docs")
    )
    victims = docs.orderBy("doc_id").limit(3).collect()
    # rewrite with text that REMOVES common terms and adds new ones — the
    # df drift case the round-2 approximation got wrong
    updates = _mk_update(
        spark,
        [(v["url"], f"replacement corpus words only {i}")
         for i, v in enumerate(victims)],
    )
    m = build_delta_segment(spark, small_index, updates, "seg-000001")
    assert m["updated"] == 3 and m["replaced_dl_sum"] > 0
    assert os.path.isdir(os.path.join(small_index, "segments", "seg-000001", "df_neg"))

    info = load_index_info(small_index)
    oracle = _oracle_from_docs(spark, small_index)
    # exact N and avgdl vs the oracle's own corpus view
    assert info["N"] == oracle.N
    assert abs(info["avgdl"] - oracle.avgdl) < 1e-9

    # score identity for queries touching removed terms, shared terms, and
    # the new replacement terms
    for q in ["the data", "spark block", "replacement corpus", "words only"]:
        res = search(spark, small_index, [("q", q, 10)]).collect()
        got = [(r["doc_id"], r["score"]) for r in sorted(res, key=lambda r: r["rank"])]
        want = oracle_topk(oracle, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, q


def test_term_dfs_subtracts_df_neg(spark, small_index):
    from opensearch_loader_spark.query_engine import term_dfs

    docs = spark.read.parquet(
        os.path.join(small_index, "segments", "seg-000000", "docs")
    )
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    first_term = victim["text"].split()[0]
    info0 = load_index_info(small_index)
    df_before = term_dfs(spark, info0, [first_term]).get(first_term, 0)
    # remove the term from the victim doc
    updates = _mk_update(spark, [(victim["url"], "zzqqxx yyqqzz")])
    build_delta_segment(spark, small_index, updates, "seg-000001")
    info1 = load_index_info(small_index)
    df_after = term_dfs(spark, info1, [first_term]).get(first_term, 0)
    assert df_after == df_before - 1


# ------------------------------------------------------- atomic manifest writes

def test_atomic_write_json_never_tears(tmp_path):
    from opensearch_loader_spark import atomic_write_json

    p = str(tmp_path / "m.json")
    atomic_write_json(p, {"v": 1})
    # a failing write (unserializable object) must leave the old file intact
    with pytest.raises(TypeError):
        atomic_write_json(p, {"v": object()})
    with open(p) as f:
        assert json.load(f) == {"v": 1}


def test_crash_between_segment_write_and_flip(spark, small_index, monkeypatch):
    """Crash-injection (VERDICT item 5): kill the delta build right at the
    MANIFEST visibility flip — the old index must stay fully readable and
    rank-identical to its pre-update state."""
    import opensearch_loader_spark as pkg

    before = search(spark, small_index, [("q", "spark block", 10)]).collect()
    real = pkg.atomic_write_json

    def boom(path, obj):
        if os.path.basename(path) == "MANIFEST.json":
            raise RuntimeError("injected crash at visibility flip")
        return real(path, obj)

    monkeypatch.setattr(pkg, "atomic_write_json", boom)
    docs = spark.read.parquet(
        os.path.join(small_index, "segments", "seg-000000", "docs")
    )
    victim = docs.orderBy("doc_id").limit(1).collect()[0]["url"]
    with pytest.raises(RuntimeError, match="injected crash"):
        build_delta_segment(
            spark, small_index, _mk_update(spark, [(victim, "ghost text")]),
            "seg-crash",
        )
    monkeypatch.setattr(pkg, "atomic_write_json", real)
    # MANIFEST untouched → the half-written segment is invisible
    info = load_index_info(small_index)
    assert [m["segment"] for m in info["segments"]] == ["seg-000000"]
    after = search(spark, small_index, [("q", "spark block", 10)]).collect()
    assert sorted((r["doc_id"], round(r["score"], 9)) for r in before) == sorted(
        (r["doc_id"], round(r["score"], 9)) for r in after
    )


# ------------------------------------------------- single-chunk fast path

def test_fast_path_matches_chunked(spark, small_index):
    """The single-chunk fast path (rank emitted in the UDF) must be
    bit-identical to the chunked plan on the same queries."""
    qs = [("q1", "the spark data", 10), ("q2", "block varbyte", 5)]
    fast = search(spark, small_index, qs, postings_per_task=10**9).collect()
    chunked = search(spark, small_index, qs, postings_per_task=8).collect()
    key = lambda r: (r["query_id"], r["rank"])
    f = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in sorted(fast, key=key)]
    c = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in sorted(chunked, key=key)]
    assert f == c and len(f) > 0


def test_pretokenized_duplicate_terms_deduped(spark, small_index):
    """ADVICE r2: duplicate terms in a pre-tokenized query list must not
    double-score (disjunctive) or corrupt the intersection (conjunctive)."""
    dup = search(spark, small_index, [("q", ["spark", "spark", "block"], 10)]).collect()
    ded = search(spark, small_index, [("q", ["spark", "block"], 10)]).collect()
    norm = lambda rows: [(r["rank"], r["doc_id"], round(r["score"], 9))
                         for r in sorted(rows, key=lambda r: r["rank"])]
    assert norm(dup) == norm(ded) and dup
    dupc = search(
        spark, small_index, [("q", ["spark", "spark", "block"], 10)],
        conjunctive=True,
    ).collect()
    dedc = search(
        spark, small_index, [("q", ["spark", "block"], 10)], conjunctive=True
    ).collect()
    assert norm(dupc) == norm(dedc)


# ------------------------------------------------- locale-safe JVM tokenizer

def test_jvm_tokenizer_matches_python_on_unicode(spark):
    from opensearch_loader_spark.analysis import tokenize
    from opensearch_loader_spark.indexer import _jvm_tokens_col

    texts = [
        "Plain ASCII Text 42",
        "İstanbul KELVINK sign",      # U+0130 and U+212A lower into ascii
        "TURKISH I problem III",
        "mixed Ünïcøde SEPARATORS here",
        "ﬁ ligature and ß sharp",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(F.size(_jvm_tokens_col()).alias("n"), "text").collect()
    for r in got:
        assert r["n"] == len(tokenize(r["text"])), r["text"]


def test_build_raises_on_row_without_text_or_html(spark, tmp_path):
    bad = spark.createDataFrame(
        [("https://x.example/a", TS, None, None, "en")], CORPUS_SCHEMA
    )
    with pytest.raises(Exception, match="neither text nor html"):
        build_index(spark, bad, str(tmp_path / "idx"), n_buckets=2)


# --------------------------------------------------------------- BMP decode

def test_bmp_roundtrip_stats_spark(spark):
    from opensearch_loader_spark.operators.multimodal import (
        bmp_roundtrip_stats,
        synth_pixels,
    )

    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    rows = bmp_roundtrip_stats(ids, width=9, height=5).collect()
    assert len(rows) == 20
    for r in rows:
        px = synth_pixels(r["doc_id"], 9, 5).astype(np.int64)
        assert (r["width"], r["height"]) == (9, 5)
        assert r["sum_r"] == px[:, :, 0].sum()
        assert r["sum_g"] == px[:, :, 1].sum()
        assert r["sum_b"] == px[:, :, 2].sum()


def test_fake_media_images_decode_for_real(spark):
    from opensearch_loader_spark.operators.multimodal import (
        decode_image,
        extract_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=9)
    imgs = media.filter(F.col("kind") == "image").collect()
    assert imgs
    for r in imgs:
        img = decode_image(bytes(r["payload"]))  # REAL decode, no fake
        assert img.shape == (5, 9, 3)
    # non-BMP payloads still require fake=True
    audio = media.filter(F.col("kind") == "audio").limit(1).collect()[0]
    with pytest.raises(NotImplementedError):
        decode_image(bytes(audio["payload"]))
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 9 and all(len(f["feature"]) == 16 for f in feats)


# ----------------------------------------------------------- dedup clusters

def test_dedup_clusters_matches_bruteforce(spark):
    from opensearch_loader_spark.operators.dedup import dedup_clusters

    texts = {
        0: "alpha beta gamma delta epsilon",
        1: "alpha beta gamma delta epsilon",          # dup of 0
        2: "alpha beta gamma delta zeta",              # J=4/6 -> not >=0.8
        3: "alpha beta gamma delta epsilon eta",       # J=5/6 -> not >= 0.8
        4: "one two three four five six seven eight nine ten",
        5: "one two three four five six seven eight nine ten",   # dup of 4
        6: "one two three four five six seven eight nine golf",  # J=9/11
        7: "totally different words entirely",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["rep_id"]
           for r in dedup_clusters(docs, threshold=0.8).collect()}

    # brute force: union-find over exact-jaccard >= 0.8 pairs
    import itertools

    parent = {i: i for i in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(texts, 2):
        A, B = set(texts[a].split()), set(texts[b].split())
        if len(A & B) / len(A | B) >= 0.8:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in texts}
    assert got == want


# ------------------------------------------------------ allowed-bitmap cache

def test_doc_filter_bitmap_cached(spark, small_index):
    from opensearch_loader_spark import query_engine as qe

    qe._ALLOWED_CACHE.clear()
    r1 = search(
        spark, small_index, [("q", "spark block", 10)], doc_filter="lang = 'en'"
    ).collect()
    assert len(qe._ALLOWED_CACHE) == 1
    cached = next(iter(qe._ALLOWED_CACHE.values()))
    r2 = search(
        spark, small_index, [("q", "spark block", 10)], doc_filter="lang = 'en'"
    ).collect()
    assert next(iter(qe._ALLOWED_CACHE.values())) is cached
    assert sorted((r["doc_id"], round(r["score"], 9)) for r in r1) == sorted(
        (r["doc_id"], round(r["score"], 9)) for r in r2
    )


# ------------------------------------------------------ sharded bitmap slices

def test_bitmap_slices_roundtrip_and_payload(spark):
    """Sliced bitmaps: distributed build (never collected whole) must agree
    with the collected-bitmap membership test, and the payload must scale
    with OCCUPIED doc ranges (1 KiB per occupied 8192-doc slice), not with
    max_doc — 20 docs spread over a 10M-doc space is 2 slices, not 1.25 MB."""
    from opensearch_loader_spark.query_engine import (
        SLICE_DOCS,
        assemble_slices,
        bitmap_contains,
        docid_bitmap_slices,
    )

    ids = list(range(100, 110)) + list(range(10_000_000, 10_000_010))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = docid_bitmap_slices(df).collect()
    occupied = {i // SLICE_DOCS for i in ids}
    assert {r["slice_id"] for r in rows} == occupied
    assert all(len(bytes(r["bm"])) == SLICE_DOCS // 8 for r in rows)

    # membership: probe members and non-members via per-slice assembly
    # (assembling only one slice keeps lo local, as a scoring task would)
    by_slice = {r["slice_id"]: r["bm"] for r in rows}
    for probe, want in [(100, True), (111, False), (10_000_009, True),
                        (9_999_999, False)]:
        sid = probe // SLICE_DOCS
        bm = assemble_slices([(sid, by_slice[sid])]) if sid in by_slice else None
        got = bool(bm and bitmap_contains(np.array([probe]), bm)[0])
        assert got == want, probe


def test_sharded_search_rank_identical(spark, tmp_path, monkeypatch):
    """Force sharded mode (tiny broadcast threshold): search over an updated
    index with a stored-field filter must be rank- AND score-identical to
    the broadcast-bitmap path, with NO driver-side shadow bitmaps."""
    from opensearch_loader_spark import query_engine as qe

    d = str(tmp_path / "idx")
    corpus = make_corpus_df(spark, n_docs=120, seed=42)
    build_index(spark, corpus, d, n_buckets=4, block_size=16, rows_per_run=50)
    docs = spark.read.parquet(os.path.join(d, "segments", "seg-000000", "docs"))
    victims = [r["url"] for r in docs.orderBy("doc_id").limit(3).collect()]
    updates = _mk_update(
        spark,
        [(u, f"rewritten spark block slice {i}") for i, u in enumerate(victims)],
    )
    build_delta_segment(spark, d, updates, "seg-000001")

    qs = [("q1", "spark block", 10), ("q2", "the data", 10)]
    base_plain = search(spark, d, qs).collect()
    base_filt = search(spark, d, qs, doc_filter="lang = 'en'").collect()
    base_c = search(spark, d, [("q", "spark block", 10)], conjunctive=True).collect()

    monkeypatch.setattr(qe, "BITMAP_BROADCAST_MAX_DOC", 16)
    qe._READER_CACHE.clear()
    qe._ALLOWED_SLICES_CACHE.clear()
    reader = qe.get_reader(spark, d)
    assert reader.sharded
    # no O(max_doc) driver bitmaps in sharded mode
    assert all(v is None for v in reader.shadows.values())

    norm = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )
    got_plain = search(spark, d, qs).collect()
    assert norm(got_plain) == norm(base_plain)
    got_filt = search(spark, d, qs, doc_filter="lang = 'en'").collect()
    assert norm(got_filt) == norm(base_filt)
    # conjunctive path through sliced shadows too
    got_c = search(spark, d, [("q", "spark block", 10)], conjunctive=True).collect()
    assert norm(got_c) == norm(base_c)
    qe._READER_CACHE.clear()


# -------------------------------------------------------------- CLI round 3

def test_load_job_cli_round3_flags(spark, tmp_path, monkeypatch):
    """--log-level, --compact, and default spec discovery."""
    import yaml

    from scripts.load_job import main

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    docs = spark.createDataFrame(
        [(i, f"spark row text {i} common words") for i in range(40)],
        "doc_id long, body string",
    )
    docs.write.mode("overwrite").parquet(str(data_dir / "docs.parquet"))
    spec = {
        "indices": [
            {
                "index_name": "cli3",
                "query": {"table": "docs"},
                "id_field": "doc_id",
                "text_fields": ["body"],
                "update_queries": [
                    {"table": "docs", "where": "doc_id < 10"},
                ],
            }
        ]
    }
    (tmp_path / "indices.yaml").write_text(yaml.safe_dump(spec))
    monkeypatch.chdir(tmp_path)
    rc = main(
        [
            "--data-dir", str(data_dir),
            "--output-dir", str(tmp_path / "out"),
            "--log-level", "ERROR",
            "--compact",
        ]
    )  # note: no --spec → discovered from cwd
    assert rc == 0
    info = load_index_info(str(tmp_path / "out" / "cli3"))
    # --compact folded base + update delta into one segment
    assert len(info["segments"]) == 1
    assert info["segments"][0]["segment"].startswith("seg-")
    assert info["N"] == 40
