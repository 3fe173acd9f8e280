"""Text-analysis functions for training-data pipelines — all expressed with
built-in pyspark.sql.functions (JVM-side, whole-stage-codegen) so each has an
exact DuckDB-SQL oracle.

- language_id: stopword-marker heuristic over the token set
- quality_score: length / stopword-ratio / mean-token-length features
- token_count: whitespace + punctuation tokenization count
- fingerprint: md5 of the normalized token stream (document fingerprint;
  the portable stand-in for a rolling hash — same value in DuckDB)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker vocabularies per language (public-knowledge stopwords)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "por", "una"],
}

EN_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "it", "that", "for"]


def tokens_col(text_col: str = "text") -> Column:
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda x: x != "")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def _marker_hits(lang: str) -> Column:
    toks = tokens_col("text")
    hits = F.lit(0)
    for m in LANG_MARKERS[lang]:
        hits = hits + F.when(F.array_contains(toks, m), 1).otherwise(0)
    return hits


def language_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Predict language by marker-word hits; ties → 'und' unless one language
    strictly wins. Deterministic and SQL-portable."""
    out = docs.select(
        F.col(id_col), *[_marker_hits(lang).alias(f"hits_{lang}") for lang in LANG_MARKERS]
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later overwrite
    for l in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{l}") == best) & (best > 0), F.lit(l)
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred).select(id_col, "pred_lang")


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features + composite score in [0,1]:
    0.4·min(n_tokens/100,1) + 0.3·(1-stopword_ratio) + 0.3·min(mean_len/8,1)."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS))).cast("double")
    mean_len = F.when(
        n_tokens > 0,
        (F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x)) / n_tokens),
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - sw_ratio)
        + 0.3 * F.least(mean_len / 8.0, F.lit(1.0))
    )
    return docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 over the space-joined normalized tokens."""
    return docs.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tokens_col(text_col))).alias("fingerprint"),
    )
