from opensearch_loader_spark.analysis import (
    edge_ngrams,
    query_terms,
    shingles,
    term_freqs,
    tokenize,
)


def test_tokenize_goldens():
    assert tokenize("The DATA, of: spark!") == ["the", "data", "of", "spark"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("a1 b2-c3") == ["a1", "b2", "c3"]
    # non-ASCII letters are separators in the pinned spec
    assert tokenize("naïve") == ["na", "ve"]
    assert tokenize("  multiple   spaces ") == ["multiple", "spaces"]


def test_term_freqs():
    assert term_freqs("the the data") == {"the": 2, "data": 1}


def test_query_terms_dedup_order():
    assert query_terms("data THE data spark") == ["data", "the", "spark"]


def test_edge_ngrams():
    assert edge_ngrams("spark") == ["sp", "spa"]
    assert edge_ngrams("a") == []
    assert edge_ngrams("ab") == ["ab"]


def test_shingles():
    assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == ["a"]
    assert shingles([], 3) == []
