"""Table access for the driver-generated parquet tables + corpus derivation.

The reference's "source" is a paginated Cypher scan (memgraph_client.py:
128-197); ours is a partition-parallel parquet/Iceberg scan — predicate
pushdown and column pruning come free from Catalyst (verify in .explain:
PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver `documents` table onto the north-rule corpus shape
    (url, warc_ts, html, text, lang). Urls are zero-padded so the engine's
    url-ordered docID assignment reproduces the original doc_id exactly —
    this is what lets the compressed-index query path share a DuckDB SQL
    oracle keyed on documents.doc_id."""
    return load_table(spark, sf_dir, "documents").select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
