"""Tokenizer contract — THE byte-determinism anchor of the whole engine.

The reference delegates analysis to OpenSearch's ``standard`` analyzer via the
``text`` mapping type (reference loader.py:311, indices.example.yaml:128-135).
We pin our analyzer spec here and share the *same function* between the Spark
engine (via pandas/Arrow UDFs) and the pure-Python golden oracle, so
rank-identity can never drift on tokenization.

Spec (frozen — see SURVEY.md §7.2):
  1. lowercase (Python ``str.lower``)
  2. extract maximal runs matching ``[a-z0-9]+`` (ASCII word chars; Unicode
     letters outside ASCII are treated as separators, matching the simple
     cross-engine-reproducible subset of the standard analyzer)

SQL-parity note: for driver-oracle queries over ``documents`` (whose text is
pure ``[a-z0-9 ]``), the equivalent is ``split(lower(text), ' ')`` in both
Spark SQL and DuckDB.
"""

from __future__ import annotations

import re
from collections import Counter

TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str | None) -> list[str]:
    """Analyze one document/query string into a token list (order kept)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def term_freqs(text: str | None) -> dict[str, int]:
    """Bag-of-words term frequencies for one document."""
    return dict(Counter(tokenize(text)))


def query_terms(query: str) -> list[str]:
    """Unique query terms in first-seen order (bag-of-words, qtf=1 —
    standard Lucene practice for duplicate query terms is qtf scaling, but
    the reference's delegated search uses simple match queries; we pin
    qtf=1 and document it)."""
    seen: dict[str, None] = {}
    for t in tokenize(query):
        seen.setdefault(t, None)
    return list(seen)


def edge_ngrams(token: str, min_n: int = 2, max_n: int = 3) -> list[str]:
    """Edge n-grams for search_as_you_type prefix search (reference
    loader.py:237-276 installs OpenSearch's search_as_you_type which builds
    2/3-shingle + edge-ngram subfields)."""
    return [token[:n] for n in range(min_n, min(max_n, len(token)) + 1)]


SAYT_MAX_PREFIX = 10


def sayt_analyzer(text: str | None) -> list[str]:
    """search_as_you_type index-time analyzer (reference loader.py:237-276 →
    OpenSearch subfields): base tokens + 2-shingles ("2g:a b") + 3-shingles
    ("3g:a b c") + edge-ngram prefixes of each token ("pf:s", "pf:sp", ...
    capped at SAYT_MAX_PREFIX, Lucene's index_prefixes analogue). Subfield
    terms are namespaced so they can never collide with base tokens — posting
    lists key on arbitrary strings, only the analyzer defines term shape."""
    toks = tokenize(text)
    out = list(toks)
    for n, tag in ((2, "2g:"), (3, "3g:")):
        if len(toks) >= n:
            out.extend(
                tag + " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    for t in toks:
        out.extend(f"pf:{t[:n]}" for n in range(1, min(len(t), SAYT_MAX_PREFIX) + 1))
    return out


def shingles(tokens: list[str], n: int = 3) -> list[str]:
    """Word n-gram shingles (for MinHash / Jaccard dedup)."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
