"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k per query vector — the baseline.
  JVM-side throughout: dot product via F.zip_with + F.aggregate (no Python
  in the hot path), window top-k with deterministic tie-break.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  (SimHash for vectors); candidates share ≥1 of `n_tables` bucket keys, so
  the pairwise scoring is restricted to bucket collisions instead of the
  full cross join. Recall < 1 by construction; the baseline is the oracle.

Scale notes: brute force is O(Q·N) — fine when Q (queries) is small and
broadcastable; the LSH variant shuffles on (table, bucket) and its fan-out
per bucket is bounded, so it survives N at 100 TB where the cross join
cannot.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """All-pairs cosine: queries(vec_id, embedding) × corpus(vec_id, embedding).
    The query side is broadcast (small); cosine computed in float64."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
        )
        .select("query_id", "neighbor_id", "cosine")
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10, exclude_self: bool = True
) -> DataFrame:
    """Exact cosine top-k per query. Deterministic: rank by
    (round(cosine,6) desc, neighbor_id asc) so float last-bit noise cannot
    flip ranks between runs/engines."""
    from pyspark.sql.window import Window

    pairs = cosine_pairs(queries, corpus)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn("cosine_r", F.round(F.col("cosine"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.col("cosine_r").alias("cosine"))
    )


def random_hyperplanes(dim: int, n_tables: int, bits_per_table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits_per_table, dim))


def md5_sign_planes(dim: int, n_tables: int, bits_per_table: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplanes from md5 parity — a valid
    sign-random-projection family that ANY engine can reproduce in SQL
    (DuckDB oracle: parity of md5('pl:t:b:d')'s first hex nibble). Used with
    integer-quantized inputs so projections are EXACT int64 arithmetic:
    bucket keys are bit-identical across engines, never float-sign-flaky."""
    import hashlib

    out = np.empty((n_tables, bits_per_table, dim), dtype=np.int64)
    for t in range(n_tables):
        for b in range(bits_per_table):
            for d in range(dim):
                v = int(hashlib.md5(f"pl:{t}:{b}:{d}".encode()).hexdigest()[0], 16)
                out[t, b, d] = 1 if v % 2 == 1 else -1
    return out


def lsh_bucket_keys(
    vectors: DataFrame,
    dim: int,
    n_tables: int = 8,
    bits_per_table: int = 8,
    seed: int = 42,
    plane_family: str = "gaussian",
) -> DataFrame:
    """(vec_id, table, bucket) — sign-random-projection LSH. The hyperplane
    tensor is tiny and shipped in the UDF closure (broadcast-equivalent).

    plane_family="md5sign": deterministic ±1 planes + floor(val*1e6) int64
    quantization → projections are exact integer sums, reproducible in SQL
    (the driver's DuckDB oracle computes the identical buckets)."""
    import pandas as pd
    from pyspark.sql import types as T

    if plane_family == "md5sign":
        planes = md5_sign_planes(dim, n_tables, bits_per_table)
    else:
        planes = random_hyperplanes(dim, n_tables, bits_per_table, seed)
    quantize = plane_family == "md5sign"

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def _buckets(batches):
        for pdf in batches:
            mat = np.stack(pdf["embedding"].values).astype(np.float64)  # (n, dim)
            if quantize:
                mat = np.floor(mat * 1_000_000.0).astype(np.int64)
            out_ids, out_tab, out_bkt = [], [], []
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, bits)
                bits = (proj > 0).astype(np.int64)
                key = (bits << np.arange(bits_per_table, dtype=np.int64)).sum(axis=1)
                out_ids.append(pdf["vec_id"].values)
                out_tab.append(np.full(len(pdf), t, dtype=np.int32))
                out_bkt.append(key)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "table": np.concatenate(out_tab),
                    "bucket": np.concatenate(out_bkt),
                }
            )

    return vectors.select("vec_id", "embedding").mapInPandas(_buckets, schema)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 8,
    bits_per_table: int = 8,
    seed: int = 42,
    plane_family: str = "gaussian",
) -> DataFrame:
    """ANN: score only bucket-colliding candidates, then exact cosine + top-k
    on the candidate set."""
    from pyspark.sql.window import Window

    qb = lsh_bucket_keys(
        queries, dim, n_tables, bits_per_table, seed, plane_family
    ).select(F.col("vec_id").alias("query_id"), "table", "bucket")
    cb = lsh_bucket_keys(
        corpus, dim, n_tables, bits_per_table, seed, plane_family
    ).select(F.col("vec_id").alias("neighbor_id"), "table", "bucket")
    # broadcast the QUERY side's bucket keys (round 6, guide §3.1): the
    # query set is small/broadcastable by contract (module docstring), but
    # qb comes out of a mapInPandas so the planner has no size estimate and
    # falls back to shuffling BOTH sides on (table, bucket). The hint turns
    # the candidate join into a broadcast hash join — the corpus bucket
    # table is never shuffled.
    cand = (
        F.broadcast(qb).join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
