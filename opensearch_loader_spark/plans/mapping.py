"""Grouped-mapping parse + schema validation — reference loader.py:281-458
semantics, re-expressed as StructType construction and schema conformance.

Reference behavior matched exactly:
- grouped YAML ``{type: [field, ...]}`` → per-field ``{field: {type: t}}``
  (loader.py:281-371)
- the closed type set (loader.py:311-312): keyword, text,
  search_as_you_type, long, integer, double, float, boolean, date, object
- single-level dot notation ``parent.child`` creates an object parent with
  the child as a sub-property (loader.py:336-352, 358-366); >1 dot level is
  an error; duplicate fields are an error (loader.py:331-349); a field that
  is both top-level and a dot-parent conflicts
- field validation: every (recursively extracted, dot-notated) field of a
  result document must be mapped, else the index is rejected
  (loader.py:373-429, extraction 431-458); validation looks at the first
  element of list values (loader.py:452-456)
"""

from __future__ import annotations

from pyspark.sql import types as T

VALID_TYPES = {
    "keyword", "text", "search_as_you_type", "long", "integer",
    "double", "float", "boolean", "date", "object",
}

_SPARK_TYPE = {
    "keyword": T.StringType(),
    "text": T.StringType(),
    "search_as_you_type": T.StringType(),
    "long": T.LongType(),
    "integer": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "object": None,  # built from children
}


class MappingError(ValueError):
    pass


def parse_grouped_mapping(grouped: dict) -> dict:
    """{type: [field,...]} → {field: {"type": t} | {"type":"object",
    "properties": {child: {"type": t}}}} with the reference's error cases."""
    flat: dict[str, dict] = {}
    dotted: dict[str, dict[str, str]] = {}
    seen: set[str] = set()
    for ftype, fields in grouped.items():
        ftype = str(ftype).strip()
        if ftype not in VALID_TYPES:
            raise MappingError(f"invalid field type: {ftype!r}")
        if not isinstance(fields, list):
            raise MappingError(f"fields for type {ftype!r} must be a list")
        for field in fields:
            field = str(field).strip()
            if field in seen:
                raise MappingError(f"duplicate field in mapping: {field!r}")
            seen.add(field)
            if "." in field:
                parts = field.split(".")
                if len(parts) != 2 or not all(parts):
                    raise MappingError(
                        f"only single-level dot notation supported: {field!r}"
                    )
                parent, child = parts
                dotted.setdefault(parent, {})[child] = ftype
            else:
                flat[field] = {"type": ftype}
    for parent, children in dotted.items():
        if parent in flat and flat[parent]["type"] != "object":
            raise MappingError(
                f"field {parent!r} is both a scalar and a dot-notation parent"
            )
        flat[parent] = {
            "type": "object",
            "properties": {c: {"type": t} for c, t in children.items()},
        }
    return flat


def mapping_to_struct(mapping: dict) -> T.StructType:
    """Per-field mapping → Spark StructType (dots → nested structs)."""
    fields = []
    for name, spec in sorted(mapping.items()):
        if spec["type"] == "object":
            children = [
                T.StructField(c, _SPARK_TYPE[s["type"]])
                for c, s in sorted(spec.get("properties", {}).items())
            ]
            fields.append(T.StructField(name, T.StructType(children)))
        else:
            fields.append(T.StructField(name, _SPARK_TYPE[spec["type"]]))
    return T.StructType(fields)


def extract_field_paths(schema: T.StructType, prefix: str = "") -> set[str]:
    """Flatten a StructType to dotted paths (the engine analogue of the
    reference's recursive dict traversal, loader.py:431-458). Arrays are
    traversed via their element type (reference: first list element)."""
    paths: set[str] = set()
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        dt = f.dataType
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
        if isinstance(dt, T.StructType):
            paths |= extract_field_paths(dt, prefix=f"{name}.")
        else:
            paths.add(name)
    return paths


def mapped_paths(mapping: dict) -> set[str]:
    paths: set[str] = set()
    for name, spec in mapping.items():
        if spec["type"] == "object":
            for c in spec.get("properties", {}):
                paths.add(f"{name}.{c}")
        else:
            paths.add(name)
    return paths


def validate_fields(df_schema: T.StructType, mapping: dict) -> list[str]:
    """Returns the sorted list of unmapped field paths (empty = valid).
    Mirrors _validate_query_fields: reject when the document has fields the
    mapping doesn't know (dynamic:False, opensearch_client.py:103-106)."""
    return sorted(extract_field_paths(df_schema) - mapped_paths(mapping))


def enforce_mapping(df, mapping: dict):
    """Hard gate before any build stage (SURVEY.md §1.3): raise on unmapped
    fields, like the reference skips the index (loader.py:600-605)."""
    unmapped = validate_fields(df.schema, mapping)
    if unmapped:
        raise MappingError(f"unmapped fields in query result: {unmapped}")
    return df
