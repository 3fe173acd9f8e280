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


# reference props.py:8-19 DEFAULT_TYPE_MAPPING + schema.py:17 DEFAULT_TYPE
DEFAULT_TYPE = "String"
DEFAULT_TYPE_MAPPING = {
    "string": "String",
    "number": "Float",
    "integer": "Int",
    "boolean": "Boolean",
    "array": "Array",
    "list": "Array",
    "object": "Object",
    "datetime": "DateTime",
    "date": "Date",
    "TBD": "String",
}


def map_type(type_name: str, type_mapping: dict | None = None) -> str:
    """Type-name mapping with default fallback (schema.py:258-272): unmapped
    names quietly become DEFAULT_TYPE."""
    return (type_mapping or DEFAULT_TYPE_MAPPING).get(type_name, DEFAULT_TYPE)


def resolve_prop_type(prop_def: dict, type_mapping: dict | None = None):
    """(type, enum|None) with the reference's full Type resolution
    (schema.py:232-256):
    - ``Type: <str>``       → mapped via type_mapping, default DEFAULT_TYPE
    - ``Type: [a, b, ...]`` → LIST MEANS ENUM: enum=set(values),
                              type=DEFAULT_TYPE
    - no Type, ``Enum: [...]`` → enum=set(values), type='Enum'
    - ``Type: {Enum: [...]}``  → convenience dict form (kept from round 1)
    Enum values are deduplicated (reference builds a set); sorted here for
    deterministic output."""
    ptype = prop_def.get("Type")
    if isinstance(ptype, str):
        return map_type(ptype, type_mapping), None
    if isinstance(ptype, list):
        vals = sorted({str(v) for v in ptype})
        if vals:
            return DEFAULT_TYPE, vals
        return DEFAULT_TYPE, None
    if isinstance(ptype, dict):
        vals = sorted({str(v) for v in ptype.get("Enum", [])})
        return ("Enum", vals) if vals else (DEFAULT_TYPE, None)
    if ptype is None and isinstance(prop_def.get("Enum"), list):
        vals = sorted({str(v) for v in prop_def["Enum"]})
        if vals:
            return "Enum", vals
    return DEFAULT_TYPE, None


def validate_enum_values(df: DataFrame, column: str, allowed: list[str]) -> DataFrame:
    """Enum membership gate (`isin`, SURVEY §1.2): any non-null value of
    `column` outside the enum set rejects the batch."""
    bad = df.filter(
        F.col(column).isNotNull() & ~F.col(column).isin(allowed)
    ).limit(5).collect()
    if bad:
        vals = [r[column] for r in bad]
        raise ModelError(f"invalid enum values in {column!r}: {vals}")
    return df


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


def model_to_df(
    spark: SparkSession, model: dict, type_mapping: dict | None = None
) -> DataFrame:
    props_def = model.get("PropDefinitions", {})
    rows = []
    for node, spec in sorted(model.get("Nodes", {}).items()):
        props = []
        for p in spec.get("Props", []) or []:
            d = props_def.get(p) or {}
            raw = d.get("Type")
            if raw == "@relation":  # relation marker bypasses type mapping
                props.append((p, "@relation", True, bool(d.get("Key")), None))
                continue
            ptype, enum = resolve_prop_type(d, type_mapping)
            props.append((p, ptype, False, bool(d.get("Key")), enum))
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
