import pytest
from pyspark.sql import types as T

from opensearch_loader_spark.plans.mapping import (
    MappingError,
    enforce_mapping,
    mapping_to_struct,
    parse_grouped_mapping,
    validate_fields,
)
from opensearch_loader_spark.plans.model import (
    ModelError,
    derive_id_fields,
    merge_model_files,
    model_documents,
)
from opensearch_loader_spark.plans.query_validation import (
    QueryValidationError,
    validate_pagination_params,
    validate_read_only,
)

GROUPED = {
    "keyword": ["user_id", "name", "tags", "shipping.address"],
    "text": ["description"],
    "long": ["created_at"],
    "boolean": ["payment.is_verified"],
}


def test_parse_grouped():
    m = parse_grouped_mapping(GROUPED)
    assert m["user_id"] == {"type": "keyword"}
    assert m["shipping"]["type"] == "object"
    assert m["shipping"]["properties"]["address"] == {"type": "keyword"}
    assert m["payment"]["properties"]["is_verified"] == {"type": "boolean"}


def test_parse_errors():
    with pytest.raises(MappingError, match="duplicate"):
        parse_grouped_mapping({"keyword": ["a"], "text": ["a"]})
    with pytest.raises(MappingError, match="single-level"):
        parse_grouped_mapping({"keyword": ["a.b.c"]})
    with pytest.raises(MappingError, match="invalid field type"):
        parse_grouped_mapping({"nonsense": ["a"]})
    with pytest.raises(MappingError, match="both a scalar"):
        parse_grouped_mapping({"keyword": ["a", "a.b"]})


def test_struct_and_validation(spark):
    m = parse_grouped_mapping(GROUPED)
    st = mapping_to_struct(m)
    assert isinstance(st["shipping"].dataType, T.StructType)
    good = spark.createDataFrame(
        [("u1", "x", (True,))],
        T.StructType(
            [
                T.StructField("user_id", T.StringType()),
                T.StructField("description", T.StringType()),
                T.StructField(
                    "payment",
                    T.StructType([T.StructField("is_verified", T.BooleanType())]),
                ),
            ]
        ),
    )
    assert validate_fields(good.schema, m) == []
    enforce_mapping(good, m)
    bad = good.withColumnRenamed("description", "unmapped_col")
    assert validate_fields(bad.schema, m) == ["unmapped_col"]
    with pytest.raises(MappingError, match="unmapped_col"):
        enforce_mapping(bad, m)


MODEL = {
    "Nodes": {
        "user": {"Props": ["user_id", "status", "friend_of"]},
        "order": {"Props": ["order_id"]},
    },
    "PropDefinitions": {
        "user_id": {"Type": "String", "Key": True},
        "status": {"Type": {"Enum": ["active", "idle", "banned"]}},
        "friend_of": {"Type": "@relation"},
        "order_id": {"Type": "Int", "Key": True},
    },
}


def test_model_unnest_counts(spark):
    nodes = model_documents(spark, MODEL, "node").collect()
    props = model_documents(spark, MODEL, "property").collect()
    vals = model_documents(spark, MODEL, "value").collect()
    assert len(nodes) == 2
    # relation-typed props skipped (loader.py:757-759)
    assert {(r["node"], r["property"]) for r in props} == {
        ("user", "user_id"), ("user", "status"), ("order", "order_id"),
    }
    # value docs = Σ|enum values| with composite ids
    assert {r["doc_id"] for r in vals} == {
        "user_status_active", "user_status_idle", "user_status_banned",
    }


def test_model_id_derivation():
    ids = derive_id_fields(MODEL)
    assert ids == {"user": "user_id", "order": "order_id"}
    bad = {
        "Nodes": {"n": {"Props": ["a", "b"]}},
        "PropDefinitions": {"a": {"Key": True}, "b": {"Key": True}},
    }
    with pytest.raises(ModelError, match="multiple key"):
        derive_id_fields(bad)


def test_model_merge_later_wins():
    m1 = {"Nodes": {"a": {"Props": ["x"]}}, "PropDefinitions": {"x": {}}}
    m2 = {"Nodes": {"a": {"Props": ["y"]}}, "PropDefinitions": {"y": {}}}
    merged = merge_model_files([m1, m2])
    assert merged["Nodes"]["a"]["Props"] == ["y"]


def test_query_lint():
    validate_read_only("MATCH (u:User) RETURN u.name")
    validate_read_only("SELECT * FROM docs")
    for bad in [
        "MATCH (u) SET u.x = 1",
        "CREATE (n)",
        "MATCH (u) DETACH DELETE u",
        "DROP TABLE x",
        "",
        "foobar nothing",
    ]:
        with pytest.raises(QueryValidationError):
            validate_read_only(bad)
    validate_pagination_params("MATCH (u) RETURN u SKIP $skip LIMIT $limit")
    with pytest.raises(QueryValidationError):
        validate_pagination_params("MATCH (u) RETURN u")


def test_model_type_resolution_edge_cases(spark):
    """Reference schema.py:232-272: list-form Type = enum with DEFAULT_TYPE;
    bare Enum key = enum with type 'Enum'; str Type mapped via type_mapping
    with default fallback."""
    from opensearch_loader_spark.plans.model import (
        DEFAULT_TYPE,
        map_type,
        model_to_df,
        resolve_prop_type,
    )

    assert map_type("integer") == "Int"
    assert map_type("datetime") == "DateTime"
    assert map_type("no_such_type") == DEFAULT_TYPE
    assert map_type("integer", {"integer": "Long"}) == "Long"

    assert resolve_prop_type({"Type": "string"}) == ("String", None)
    assert resolve_prop_type({"Type": ["b", "a", "b"]}) == ("String", ["a", "b"])
    assert resolve_prop_type({"Enum": ["x", "y"]}) == ("Enum", ["x", "y"])
    assert resolve_prop_type({"Type": {"Enum": ["z"]}}) == ("Enum", ["z"])
    assert resolve_prop_type({"Type": []}) == ("String", None)
    assert resolve_prop_type({}) == ("String", None)

    model = {
        "Nodes": {"n": {"Props": ["a", "b", "c", "r"]}},
        "PropDefinitions": {
            "a": {"Type": ["red", "blue"]},        # list = enum
            "b": {"Enum": ["p", "q"]},             # bare Enum key
            "c": {"Type": "integer"},              # mapped scalar
            "r": {"Type": "@relation"},            # relation skipped in docs
        },
    }
    df = model_to_df(spark, model)
    props = {p["name"]: p for p in df.collect()[0]["props"]}
    assert props["a"]["type"] == "String" and props["a"]["enum"] == ["blue", "red"]
    assert props["b"]["type"] == "Enum" and props["b"]["enum"] == ["p", "q"]
    assert props["c"]["type"] == "Int" and props["c"]["enum"] is None
    assert props["r"]["is_relation"] is True


def test_model_value_docs_from_list_enum(spark):
    from opensearch_loader_spark.plans.model import model_documents

    model = {
        "Nodes": {"n": {"Props": ["a"]}},
        "PropDefinitions": {"a": {"Type": ["red", "blue"]}},
    }
    vals = model_documents(spark, model, "value").collect()
    assert sorted(r["doc_id"] for r in vals) == ["n_a_blue", "n_a_red"]


def test_validate_enum_values(spark):
    from opensearch_loader_spark.plans.model import ModelError, validate_enum_values

    df = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, None)], "id long, color string"
    )
    validate_enum_values(df, "color", ["red", "blue"])  # passes, NULL allowed
    import pytest as _pytest

    with _pytest.raises(ModelError, match="green"):
        validate_enum_values(
            df.union(spark.createDataFrame([(4, "green")], df.schema)),
            "color", ["red", "blue"],
        )
