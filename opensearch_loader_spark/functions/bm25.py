"""BM25 math — single source of truth for engine, oracle and SQL strings.

Params pinned by the north rule: k1=1.2, b=0.75 (Lucene/OpenSearch defaults —
what the reference's `text` mapping invokes, reference loader.py:311).

Formula (Lucene BM25Similarity, the scorer OpenSearch runs for the mappings
the reference installs):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t, d)   = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

Note Lucene >= 8 drops the classic ``(k1+1)`` numerator factor (it does not
change ranking); we pin the *with*-(k1+1) classic form because it is exactly
SQL-expressible and we hold both engine and oracle to the same string:

    score(t, d) = idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b*dl/avgdl))

Determinism contract: float64 throughout; per-document total = sum of
per-term scores accumulated in ASCENDING TERM ORDER (engine, oracle and the
DuckDB SQL all obey this — SURVEY.md §4.2.4).
"""

from __future__ import annotations

import math

import numpy as np

from opensearch_loader_spark import BM25_B, BM25_K1


def bm25_idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_term_score(
    tf: np.ndarray | float,
    dl: np.ndarray | float,
    idf: float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray | float:
    """Vectorized per-(term, doc) BM25 contribution."""
    tf = np.asarray(tf, dtype=np.float64) if isinstance(tf, np.ndarray) else float(tf)
    norm = tf + k1 * (1.0 - b + b * (np.asarray(dl, np.float64) if isinstance(dl, np.ndarray) else float(dl)) / avgdl)
    return idf * (tf * (k1 + 1.0)) / norm


def tf_norm_bound(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = BM25_K1, b: float = BM25_B
) -> float:
    """Max over a posting block of the idf-free score part — the block-max
    metadata (north rule; Lucene analogue: impacts / BMW upper bounds).
    Multiplying by idf(t) at query time gives a true upper bound for the
    block because idf is per-term constant."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    part = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return float(part.max()) if part.size else 0.0


# SQL fragment shared between Spark SQL and DuckDB oracle strings (both
# support ln/greatest and this exact arithmetic in float64).
BM25_SCORE_SQL = (
    "ln(1.0 + (({N}) - df + 0.5) / (df + 0.5)) * "
    "(tf * ({k1} + 1.0)) / (tf + {k1} * (1.0 - {b} + {b} * dl / ({avgdl})))"
)
