"""Spec-level behaviors: nested struct paths (nested-model analog),
compile-time consistency checks (registry topo-sort analog), and the
validator-cache contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from satya_spark.compiler import compile_spec
from satya_spark.spec import FieldSpec, TableSpec, transcript_spec


def test_nested_struct_path_rules(spark):
    """Nested-model constraint propagation (src/lib.rs:919-935;
    src/satya/validator.py:310-374): rules flatten onto dotted paths
    over StructType columns — no registry needed."""
    spec = TableSpec(
        name="nested",
        fields=(
            FieldSpec("meta.author", "string", required=True, min_length=2),
            FieldSpec("meta.version", "int", ge=1),
        ),
    )
    schema = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("author", T.StringType()),
                        T.StructField("version", T.IntegerType()),
                    ]
                ),
            )
        ]
    )
    df = spark.createDataFrame([(("ann", 2),), (("x", 0),), ((None, 1),)], schema)
    compiled = compile_spec(spec)
    rows = compiled.with_validation(df).collect()
    assert rows[0]["valid"]
    assert {(v["field"], v["constraint_name"]) for v in rows[1]["violations"]} == {
        ("meta.author", "min_length"),
        ("meta.version", "ge"),
    }
    assert [(v["field"], v["constraint_name"]) for v in rows[2]["violations"]] == [
        ("meta.author", "required")
    ]


def test_spec_validate_rejects_inconsistencies():
    with pytest.raises(ValueError, match="duplicate"):
        TableSpec(
            name="d", fields=(FieldSpec("a"), FieldSpec("a"))
        ).validate()
    with pytest.raises(ValueError, match="unique_key"):
        TableSpec(
            name="d", fields=(FieldSpec("a"),), unique_key=("zz",)
        ).validate()
    with pytest.raises(ValueError, match="circular"):
        TableSpec(
            name="d",
            fields=(FieldSpec("a"),),
            references=(("a", "d"),),
        ).validate()
    transcript_spec().validate()  # the flagship spec is consistent


def test_compile_is_reusable_across_frames(spark):
    """Compile-once semantics (class-level validator cache,
    src/satya/__init__.py:326-328): one CompiledSpec validates many
    frames."""
    compiled = compile_spec(
        TableSpec(name="r", fields=(FieldSpec("v", "int", ge=0),))
    )
    a = spark.createDataFrame([(1,), (-1,)], "v int")
    b = spark.createDataFrame([(5,)], "v int")
    assert [r["valid"] for r in compiled.with_validation(a).collect()] == [True, False]
    assert [r["valid"] for r in compiled.with_validation(b).collect()] == [True]


def test_field_violation_counts(spark):
    from satya_spark.engine import ValidationEngine
    from satya_spark.transcripts import synthesize

    eng = ValidationEngine(transcript_spec())
    out = eng.field_violation_counts(synthesize(spark, 300)).collect()
    got = {(r["field"], r["constraint_name"]): r["n"] for r in out}
    assert ("role", "enum") in got and got[("role", "enum")] > 0
