"""Pure-Python golden BM25 oracle — the stand-in for "the reference engine's
golden results" (no OpenSearch in this sandbox; SURVEY.md §5.2.3).

Brute-force, exhaustive scorer sharing the tokenizer (analysis.py) and BM25
math (functions/bm25.py) with the Spark engine. Determinism: per-doc score =
sum of per-term float64 contributions in ASCENDING TERM ORDER; final rank
tie-break (score desc, docID asc).
"""

from __future__ import annotations

from dataclasses import dataclass

from opensearch_loader_spark.analysis import query_terms, term_freqs
from opensearch_loader_spark.functions.bm25 import bm25_idf, bm25_term_score


@dataclass
class OracleIndex:
    N: int
    avgdl: float
    doc_len: dict[int, int]                 # docID -> dl
    postings: dict[str, dict[int, int]]     # term -> {docID: tf}


def build_oracle_index(docs: dict[int, str]) -> OracleIndex:
    """docs: docID -> raw text."""
    doc_len: dict[int, int] = {}
    postings: dict[str, dict[int, int]] = {}
    for doc_id, text in docs.items():
        tfs = term_freqs(text)
        doc_len[doc_id] = sum(tfs.values())
        for term, tf in tfs.items():
            postings.setdefault(term, {})[doc_id] = tf
    n = len(docs)
    avgdl = (sum(doc_len.values()) / n) if n else 0.0
    return OracleIndex(N=n, avgdl=avgdl, doc_len=doc_len, postings=postings)


def oracle_topk(index: OracleIndex, query: str, k: int = 10) -> list[tuple[int, float]]:
    """Disjunctive (match-any) BM25 top-k, the OpenSearch `match` default."""
    terms = sorted(query_terms(query))  # ascending term order = summation order
    scores: dict[int, float] = {}
    for t in terms:
        plist = index.postings.get(t)
        if not plist:
            continue
        idf = bm25_idf(index.N, len(plist))
        for doc_id, tf in plist.items():
            s = bm25_term_score(tf, index.doc_len[doc_id], idf, index.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def oracle_topk_conjunctive(
    index: OracleIndex, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Conjunctive (all terms must match) variant — posting-list
    intersection semantics (SURVEY.md §2 #20)."""
    terms = sorted(query_terms(query))
    if not terms:
        return []
    doc_sets = [set(index.postings.get(t, {})) for t in terms]
    candidates = set.intersection(*doc_sets) if doc_sets else set()
    scores: dict[int, float] = {d: 0.0 for d in candidates}
    for t in terms:
        plist = index.postings.get(t, {})
        idf = bm25_idf(index.N, len(plist))
        for d in candidates:
            scores[d] += bm25_term_score(plist[d], index.doc_len[d], idf, index.avgdl)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def reference_query_set() -> list[tuple[str, str, int]]:
    """(query_id, query_text, k) — head/torso/tail mixes per FIXTURES.md §A."""
    qs = [
        ("q_head_1", "the", 10),
        ("q_head_2", "data", 10),
        ("q_torso_1", "spark", 10),
        ("q_torso_2", "shuffle skew", 10),
        ("q_tail_1", "varbyte", 10),
        ("q_tail_2", "wand delta", 10),
        ("q_conj_2", "index search", 10),
        ("q_conj_3", "query term block", 10),
        ("q_conj_4", "merge scan hash sort", 10),
        ("q_absent", "zzznotaword", 10),
        ("q_case", "The DATA", 10),
        ("q_punct", "spark, query!", 10),
        ("q_mixed", "the varbyte", 10),
        ("q_w_tail", "w0001 w0042", 10),
    ]
    return qs
