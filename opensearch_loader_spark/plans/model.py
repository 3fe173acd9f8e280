"""Graph-model document generation — the reference's model-index path
(loader.py:709-788, schema.py:29-107) as Spark explode/unnest.

The reference loads YAML model files (Nodes / Relationships /
PropDefinitions), derives per-node id fields from `Key` props (error if a
node has more than one key, schema.py:94-107), and generates three document
subtypes via a Python generator (loader.py:728-788):

- node:     one doc per node
- property: one doc per non-`@relation`-typed property (skip at :757-759)
- value:    one doc per (property, enum value) — a DOUBLE unnest (:774-788)

Spark expression: build a small DataFrame of nodes with their property
structs, then ``explode`` once for properties and twice for enum values
(SURVEY.md §2 #58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ModelError(ValueError):
    pass


MODEL_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType()),
        T.StructField(
            "props",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("is_relation", T.BooleanType()),
                        T.StructField("is_key", T.BooleanType()),
                        T.StructField("enum", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)


def merge_model_files(models: list[dict]) -> dict:
    """Later files overwrite earlier (schema.py:50-58 dict-union semantics)."""
    merged: dict = {"Nodes": {}, "PropDefinitions": {}}
    for m in models:
        merged["Nodes"].update(m.get("Nodes", {}))
        merged["PropDefinitions"].update(m.get("PropDefinitions", {}))
    return merged


def derive_id_fields(model: dict) -> dict[str, str]:
    """node → id field from `Key: true` props; >1 key is an error
    (schema.py:94-107)."""
    out: dict[str, str] = {}
    props_def = model.get("PropDefinitions", {})
    for node, spec in model.get("Nodes", {}).items():
        keys = [
            p
            for p in spec.get("Props", []) or []
            if (props_def.get(p) or {}).get("Key")
        ]
        if len(keys) > 1:
            raise ModelError(f"node {node!r} has multiple key properties: {keys}")
        if keys:
            out[node] = keys[0]
    return out


def model_to_df(spark: SparkSession, model: dict) -> DataFrame:
    props_def = model.get("PropDefinitions", {})
    rows = []
    for node, spec in sorted(model.get("Nodes", {}).items()):
        props = []
        for p in spec.get("Props", []) or []:
            d = props_def.get(p) or {}
            ptype = d.get("Type", "String")
            enum = None
            if isinstance(ptype, dict):
                enum = [str(v) for v in ptype.get("Enum", [])] or None
                ptype = "Enum" if enum else "String"
            props.append(
                (p, str(ptype), str(ptype) == "@relation", bool(d.get("Key")), enum)
            )
        rows.append((node, props))
    return spark.createDataFrame(rows, MODEL_SCHEMA)


def model_documents(spark: SparkSession, model: dict, subtype: str) -> DataFrame:
    """Generate node/property/value docs. Composite ids follow the
    reference: ``{node}``, ``{node}_{prop}``, ``{node}_{prop}_{value}``
    (loader.py:763,777)."""
    df = model_to_df(spark, model)
    if subtype == "node":
        return df.select(
            F.col("node").alias("doc_id"), F.col("node"), F.lit("node").alias("subtype")
        )
    props = df.select("node", F.explode("props").alias("p"))
    non_rel = props.filter(~F.col("p.is_relation"))
    if subtype == "property":
        return non_rel.select(
            F.concat_ws("_", "node", "p.name").alias("doc_id"),
            "node",
            F.col("p.name").alias("property"),
            F.col("p.type").alias("prop_type"),
            F.lit("property").alias("subtype"),
        )
    if subtype == "value":
        vals = non_rel.filter(F.col("p.enum").isNotNull()).select(
            "node", "p.name", F.explode("p.enum").alias("value")
        )
        return vals.select(
            F.concat_ws("_", "node", "name", "value").alias("doc_id"),
            "node",
            F.col("name").alias("property"),
            "value",
            F.lit("value").alias("subtype"),
        )
    raise ModelError(f"unknown model subtype: {subtype!r}")
