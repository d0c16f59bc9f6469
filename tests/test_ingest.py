"""JSON ingestion paths (SURVEY.md §2.1), coercion mode (§2.4),
schema policy (§2.2), JSON Schema bridge (§1.3), custom row rules
(§2.8) — mirroring the reference's tests/test_validator.py:171-289
and tests/test_json_bytes.py behaviors."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from satya_spark.coerce import coerce
from satya_spark.compiler import compile_spec
from satya_spark.engine import ValidationEngine
from satya_spark.sources.json_source import (
    parse_json_array,
    parse_json_objects,
    read_ndjson,
    to_ndjson,
)
from satya_spark.spec import FieldSpec, RowRule, TableSpec
from satya_spark.spec_json import from_json_schema, to_json_schema

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ]
)


def test_ndjson_malformed_lines_do_not_abort(spark, tmp_path):
    # per-line verdicts; bad line flagged, not fatal (src/lib.rs:501-523)
    p = tmp_path / "in.ndjson"
    p.write_text('{"name":"ann","age":3}\n{oops\n{"name":"bo","age":4}\n')
    df = read_ndjson(spark, str(p), SCHEMA).orderBy(F.col("name").asc_nulls_last())
    rows = df.collect()
    assert [r["json_ok"] for r in rows] == [True, True, False]
    assert rows[0]["name"] == "ann" and rows[2]["name"] is None


def test_parse_json_objects(spark):
    df = spark.createDataFrame(
        [('{"name":"x","age":1}',), ("not json",)], ["payload"]
    )
    out = parse_json_objects(df, "payload", SCHEMA).collect()
    assert out[0]["json_ok"] and out[0]["name"] == "x"
    assert not out[1]["json_ok"]


def test_parse_json_array(spark):
    df = spark.createDataFrame(
        [('[{"name":"a","age":1},{"name":"b","age":2}]',), ("[broken",)],
        ["payload"],
    )
    out = parse_json_array(df, "payload", SCHEMA).collect()
    ok = [r for r in out if r["json_ok"]]
    assert [(r["item_idx"], r["name"]) for r in ok] == [(0, "a"), (1, "b")]
    assert sum(1 for r in out if not r["json_ok"]) == 1  # the broken doc


def test_ndjson_roundtrip(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["name", "age"])
    js = to_ndjson(df).collect()
    parsed = [json.loads(r["json"]) for r in js]
    assert parsed == [{"name": "a", "age": 1}, {"name": "b", "age": 2}]


# --- coercion (src/satya/validator.py:596-662) ---------------------------

def test_coercions(spark):
    spec = TableSpec(
        name="c",
        fields=(
            FieldSpec("n", "int"),
            FieldSpec("flag", "bool"),
            FieldSpec("ts", "timestamp"),
            FieldSpec("s", "string", strip_whitespace=True, to_lower=True),
            FieldSpec("opt", "string", required=False, default="dflt"),
        ),
    )
    df = spark.createDataFrame(
        [("42", "TRUE", "2024-01-02T03:04:05Z", "  MiXeD  ", None),
         ("x", "yes", "not a ts", "a", "given")],
        ["n", "flag", "ts", "s", "opt"],
    )
    out = coerce(df, spec).collect()
    assert out[0]["n"] == 42 and out[1]["n"] is None  # parse failure -> null
    assert out[0]["flag"] is True and out[1]["flag"] is None  # 'yes' rejected
    assert str(out[0]["ts"]).startswith("2024-01-02 03:04:05")
    assert out[1]["ts"] is None
    assert out[0]["s"] == "mixed"
    assert out[0]["opt"] == "dflt" and out[1]["opt"] == "given"


def test_coerce_missing_column_becomes_typed_null(spark):
    spec = TableSpec(name="m", fields=(FieldSpec("a", "string"), FieldSpec("b", "int")))
    df = spark.createDataFrame([("x",)], ["a"])
    out = coerce(df, spec)
    assert dict(out.dtypes)["b"] == "int"
    assert out.collect()[0]["b"] is None


# --- schema policy (src/satya/__init__.py:270-276, 869-879) ----------------

def test_extra_field_policy(spark):
    spec = TableSpec(
        name="p",
        fields=(FieldSpec("a", "string", required=True),),
        extra="forbid",
    )
    eng = ValidationEngine(spec)
    df = spark.createDataFrame([("x", 1)], ["a", "zz"])
    v = eng.schema_violations(df)
    assert v == [{"field": "zz", "constraint": "extra_field"}]
    conformed = eng.conform(df)
    assert conformed.columns == ["a"]


def test_missing_required_column_reported_and_conformed(spark):
    spec = TableSpec(
        name="p2",
        fields=(FieldSpec("a", "string", required=True), FieldSpec("b", "int", required=True)),
    )
    eng = ValidationEngine(spec)
    df = spark.createDataFrame([("x",)], ["a"])
    assert eng.schema_violations(df) == [{"field": "b", "constraint": "missing_column"}]
    ann = eng.annotate(eng.conform(df))
    row = ann.collect()[0]
    assert not row["valid"]
    assert ("b", "required") in [(v["field"], v["constraint_name"]) for v in row["violations"]]


# --- JSON Schema bridge (src/satya/json_schema_compiler.py:32-72) ----------

def test_json_schema_roundtrip(spark):
    schema = {
        "title": "person",
        "type": "object",
        "properties": {
            "name": {"type": "string", "minLength": 2, "maxLength": 5},
            "age": {"type": "integer", "minimum": 0, "maximum": 150},
            "email": {"type": "string", "format": "email"},
            "status": {"type": "string", "enum": ["on", "off"]},
        },
        "required": ["name", "age"],
        "additionalProperties": False,
    }
    spec = from_json_schema(schema)
    assert spec.extra == "forbid"
    assert spec.field("name").min_length == 2
    assert spec.field("email").email
    assert spec.field("status").enum == ("on", "off")
    # compiled spec validates like the hand-built one
    compiled = compile_spec(spec)
    df = spark.createDataFrame(
        [("ok", 5, "a@b.co", "on"), ("x", -1, "bad", "nope")],
        "name string, age long, email string, status string",
    )
    rows = compiled.with_validation(df).collect()
    assert rows[0]["valid"] and not rows[1]["valid"]
    assert len(rows[1]["violations"]) == 4
    # and the inverse direction reproduces the keywords
    back = to_json_schema(spec)
    assert back["properties"]["name"]["minLength"] == 2
    assert back["required"] == ["name", "age"]
    assert back["additionalProperties"] is False


# --- custom row rules (@model_validator analog) -----------------------------

def test_row_rule(spark):
    def fail():
        return F.col("lo") > F.col("hi")

    spec = TableSpec(
        name="r",
        fields=(FieldSpec("lo", "int"), FieldSpec("hi", "int")),
        row_rules=(RowRule("lo_le_hi", fail, "(lo > hi)"),),
    )
    compiled = compile_spec(spec)
    df = spark.createDataFrame([(1, 2), (5, 3)], ["lo", "hi"])
    rows = compiled.with_validation(df).collect()
    assert rows[0]["valid"] and not rows[1]["valid"]
    assert [(v["field"], v["constraint_name"]) for v in rows[1]["violations"]] == [
        ("<row>", "lo_le_hi")
    ]


def test_json_schema_nested_objects(spark):
    """Nested JSON Schema → struct columns + per-element struct rules
    (the nested-Model surface reached from a schema file), and the
    inverse direction reproduces the nested structure."""
    schema = {
        "title": "orders",
        "type": "object",
        "properties": {
            "order_id": {"type": "integer", "minimum": 1},
            "customer": {
                "type": "object",
                "properties": {
                    "name": {"type": "string", "minLength": 2},
                    "zipcode": {"type": "string", "pattern": r"^\d{5}$"},
                },
                "required": ["name"],
            },
            "items": {
                "type": "array",
                "minItems": 1,
                "items": {
                    "type": "object",
                    "properties": {
                        "sku": {"type": "string", "minLength": 3},
                        "qty": {"type": "integer", "minimum": 1},
                    },
                    "required": ["sku"],
                },
            },
            "labels": {
                "type": "array",
                "items": {"type": "string", "pattern": "^[a-z]+$"},
            },
        },
        "required": ["order_id", "customer"],
    }
    spec = from_json_schema(schema)
    assert spec.field("customer").dtype.startswith("struct<")
    assert spec.field("customer.name").min_length == 2
    assert spec.field("items").item_fields is not None
    assert spec.field("labels").pattern == "^[a-z]+$"  # per-item kernel

    df = spark.createDataFrame(
        [
            (1, ("Ann", "12345"), [("SKU99", 2)], ["ok"]),
            (2, ("B", "12x45"), [("ab", 0)], ["Nope"]),
            (3, (None, None), [], None),
        ],
        "order_id long, customer struct<name:string,zipcode:string>, "
        "items array<struct<sku:string,qty:bigint>>, labels array<string>",
    )
    rows = compile_spec(spec).with_validation(df).collect()
    assert rows[0]["valid"]
    v2 = {(v["field"], v["constraint_name"]) for v in rows[1]["violations"]}
    assert v2 == {
        ("customer.name", "min_length"),
        ("customer.zipcode", "pattern"),
        ("items[].sku", "min_length"),
        ("items[].qty", "ge"),
        ("labels", "pattern"),
    }
    v3 = {(v["field"], v["constraint_name"]) for v in rows[2]["violations"]}
    assert v3 == {("customer.name", "required"), ("items", "min_items")}

    back = to_json_schema(spec)
    assert back["properties"]["customer"]["properties"]["name"]["minLength"] == 2
    assert back["properties"]["items"]["items"]["properties"]["sku"]["minLength"] == 3
    assert back["properties"]["items"]["minItems"] == 1
    assert back["properties"]["labels"]["items"]["pattern"] == "^[a-z]+$"
    # round trip is stable
    assert from_json_schema(back) == spec


def test_json_schema_array_and_map_defaults_round_trip(spark):
    """A `default` on an array/map property survives from_json_schema
    (kept on the FieldSpec), fills nulls on the columnar path where
    lit-able, and round-trips back through to_json_schema."""
    schema = {
        "title": "cfg",
        "type": "object",
        "properties": {
            "tags": {
                "type": "array",
                "items": {"type": "string"},
                "default": ["untagged"],
            },
            "opts": {
                "type": "object",
                "additionalProperties": {"type": "string"},
                "default": {"mode": "fast"},
            },
        },
    }
    spec = from_json_schema(schema)
    assert spec.field("tags").default == ["untagged"]
    assert spec.field("opts").default == {"mode": "fast"}
    back = to_json_schema(spec)
    assert back["properties"]["tags"]["default"] == ["untagged"]
    assert back["properties"]["opts"]["default"] == {"mode": "fast"}
    # array defaults (lit-able) fill nulls on the columnar path;
    # dict defaults are spec-only (documented in coerce._columnar_default)
    from satya_spark.coerce import coerce

    df = spark.createDataFrame(
        [(None, None)], "tags array<string>, opts map<string,string>"
    )
    row = coerce(df, spec).collect()[0]
    assert row["tags"] == ["untagged"]
    assert row["opts"] is None
