"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §A).

Produces the exact north-rule input shape (driver ``input_hint``):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Zipfian token stream over a small vocabulary so head terms ("the", "data")
hit >30% of docs — this is what exercises skew splitting in the indexer.
Everything is a pure function of (seed, i): re-generation is byte-identical,
which the html→text extraction byte-identity test depends on.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd

VOCAB_CORE = [
    "the", "data", "of", "and", "page", "web", "crawl", "index", "search",
    "spark", "query", "term", "block", "merge", "scan", "hash", "sort",
    "join", "filter", "shuffle", "skew", "salt", "varbyte", "delta",
    "wand", "score", "rank", "text", "html", "url",
]


def _vocab(n_words: int = 5000) -> list[str]:
    vocab = list(VOCAB_CORE)
    i = 0
    while len(vocab) < n_words:
        vocab.append(f"w{i:04d}")
        i += 1
    return vocab


def make_corpus_pdf(n_docs: int, seed: int = 42, n_sites: int = 50) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (driver-side, small scales;
    at real scale this table lives in Iceberg already)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    # Zipf ranks: P(word r) ∝ 1/(r+1); head words cover >30% of tokens
    ranks = np.arange(len(vocab), dtype=np.float64) + 1.0
    probs = 1.0 / ranks
    probs /= probs.sum()

    doc_lens = rng.integers(5, 500, size=n_docs)
    urls, texts, htmls, tss, langs = [], [], [], [], []
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    lang_cycle = ["en"] * 9 + ["de", "fr"]
    categories = ["news", "blog", "docs", "shop"]
    for i in range(n_docs):
        toks = rng.choice(vocab, size=int(doc_lens[i]), p=probs)
        # mixed case + punctuation + a little Unicode to exercise the analyzer
        toks = [t.capitalize() if (i + j) % 17 == 0 else t for j, t in enumerate(toks)]
        text = " ".join(toks)
        if i % 13 == 0:
            text += ", naïve-case."
        url = f"https://site{i % n_sites}.example/{categories[i % 4]}/{i}"
        title = f"page {i}"
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{text}</p></body></html>"
        ).encode("utf-8")
        urls.append(url)
        texts.append(text)
        htmls.append(html)
        tss.append(base_ts + dt.timedelta(seconds=int(i) * 37 % 10_000_000))
        langs.append(lang_cycle[i % len(lang_cycle)])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def make_corpus_df(spark, n_docs: int, seed: int = 42):
    """Corpus as a Spark DataFrame with the pinned input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(make_corpus_pdf(n_docs, seed), schema=schema)


def extract_text_from_html(html: bytes) -> str:
    """Pure deterministic html→text extraction (north rule: byte-identical
    per url across re-runs). For the synthetic corpus the text is the single
    <p> body; the function is a pure parse, no randomness, no state."""
    s = html.decode("utf-8")
    start = s.find("<p>")
    end = s.rfind("</p>")
    if start == -1 or end == -1:
        return ""
    return s[start + 3 : end]


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
