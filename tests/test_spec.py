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


def test_per_item_array_constraints(spark):
    """Per-item recursion (src/lib.rs:874-918): scalar constraints on
    an array field apply to every element; NULL elements and NULL
    arrays skip value rules; container rules still apply."""
    spec = TableSpec(
        name="items",
        fields=(
            FieldSpec("tags", "array<string>", pattern=r"^[a-z]+$", min_items=1),
            FieldSpec("nums", "array<int>", ge=0, le=100),
        ),
    )
    df = spark.createDataFrame(
        [
            (1, ["ok", "fine"], [1, 2]),
            (2, ["ok", "BAD"], [3]),          # item pattern violation
            (3, ["ok"], [5, -1]),             # item ge violation
            (4, ["ok"], [5, 101]),            # item le violation
            (5, None, None),                  # null arrays skip all
            (6, [], [0, 100]),                # empty tags -> min_items
            (7, ["ok", None], [None, 7]),     # null ITEMS are skipped
        ],
        "id long, tags array<string>, nums array<int>",
    )
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    got = {(r["id"], r["field"], r["constraint_name"]) for r in rows}
    assert got == {
        (2, "tags", "pattern"),
        (3, "nums", "ge"),
        (4, "nums", "le"),
        (6, "tags", "min_items"),
    }
    off = {(r["id"], r["field"]): r["offending_value"] for r in rows}
    assert off[(2, "tags")] == "ok,BAD"
    assert off[(3, "nums")] == "5,-1"


def test_map_value_constraints(spark):
    """Dict-VALUE checks (src/lib.rs:913-918): constraints apply to
    map values; per-value bounds are codegen (array_min/max over
    map_values)."""
    spec = TableSpec(
        name="maps",
        fields=(FieldSpec("props", "map<string,int>", ge=0, le=10),),
    )
    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": 10}),
            (2, {"a": -1}),
            (3, {"a": 11}),
            (4, None),
        ],
        "id long, props map<string,int>",
    )
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    got = {(r["id"], r["constraint_name"]) for r in rows}
    assert got == {(2, "ge"), (3, "le")}


def test_per_item_string_lengths_and_enum(spark):
    spec = TableSpec(
        name="strs",
        fields=(
            FieldSpec("a", "array<string>", min_length=2, max_length=4),
            FieldSpec("b", "array<string>", enum=("x", "y")),
        ),
    )
    df = spark.createDataFrame(
        [
            (1, ["ab", "abcd"], ["x", "y"]),
            (2, ["a"], ["x"]),            # item too short (trimmed)
            (3, [" b "], ["x"]),          # trims to 1 char -> short
            (4, ["abcde"], ["x"]),        # item too long (raw)
            (5, ["ab"], ["z"]),           # not in enum
        ],
        "id long, a array<string>, b array<string>",
    )
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    got = {(r["id"], r["field"], r["constraint_name"]) for r in rows}
    assert got == {
        (2, "a", "min_length"),
        (3, "a", "min_length"),
        (4, "a", "max_length"),
        (5, "b", "enum"),
    }


def test_special_type_presets(spark):
    """Preset FieldSpecs mirror src/satya/special_types.py:139-238."""
    from satya_spark import special_types as st

    spec = TableSpec(
        name="presets",
        fields=(
            st.PositiveInt("count"),
            st.NonNegativeFloat("ratio"),
            st.EmailStr("mail"),
            st.HttpUrl("site"),
            st.PathStr("path"),
        ),
    )
    df = spark.createDataFrame(
        [
            (1, 3, 0.0, "a@b.co", "https://x.io", "/tmp/f"),
            (2, 0, -0.5, "nope", "ftp://x", ""),
        ],
        "id long, count long, ratio double, mail string, site string, path string",
    )
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    got = {(r["id"], r["field"], r["constraint_name"]) for r in rows}
    assert got == {
        (2, "count", "gt"),
        (2, "ratio", "ge"),
        (2, "mail", "email"),
        (2, "site", "url"),
        (2, "path", "min_length"),
        (2, "path", "pattern"),  # '' fails the shape regex too
    }


def test_secret_str_masks_offending_value(spark):
    from satya_spark import special_types as st

    spec = TableSpec(
        name="secrets", fields=(st.SecretStr("pwd", min_length=8),)
    )
    df = spark.createDataFrame([(1, "hunter2")], "id long, pwd string")
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    assert len(rows) == 1
    assert rows[0]["offending_value"] == "**********"
    assert "hunter2" not in str(rows)


def test_before_transform_runs_ahead_of_kernels(spark):
    """@field_validator(mode='before') analog: a Column transform
    applied before coercion and every kernel
    (src/satya/validators.py:66-107)."""
    from satya_spark.coerce import coerce

    spec = TableSpec(
        name="t",
        fields=(
            FieldSpec(
                "handle",
                "string",
                pattern=r"^[a-z]+$",
                before=lambda c: F.regexp_replace(F.lower(c), "^@", ""),
            ),
        ),
    )
    df = spark.createDataFrame([("@Alice",), ("bob",)], "handle string")
    out = coerce(df, spec)
    assert [r["handle"] for r in out.collect()] == ["alice", "bob"]
    assert compile_spec(spec).violations_df(out, ["handle"]).count() == 0


def test_after_transform_applies_on_dump(spark):
    """@field_validator(mode='after') value-rewrite analog: applied to
    the validated value on output."""
    from satya_spark.serialize import dump

    spec = TableSpec(
        name="t",
        fields=(
            FieldSpec("name", "string", after=lambda c: F.initcap(c)),
            FieldSpec("n", "long"),
        ),
    )
    df = spark.createDataFrame([("alice smith", 1)], "name string, n long")
    out = dump(df, spec).collect()
    assert out[0]["name"] == "Alice Smith" and out[0]["n"] == 1


def test_per_item_fractional_multiple_of(spark):
    # review r2: int(multiple_of) silently truncated fractional steps
    spec = TableSpec(
        name="mof",
        fields=(FieldSpec("xs", "array<double>", multiple_of=2.5),),
    )
    df = spark.createDataFrame(
        [(1, [5.0, 2.5]), (2, [4.0])], "id long, xs array<double>"
    )
    rows = compile_spec(spec).violations_df(df, ["id"]).collect()
    assert {r["id"] for r in rows} == {2}  # 5.0 IS a multiple of 2.5


def test_row_rule_validation_context(spark):
    """ValidationInfo.context analog (src/satya/validators.py:23-37):
    a custom rule parameterized by run-scoped context, folded into the
    compiled expression (fixed per run, zero per-row cost)."""
    from satya_spark.spec import RowRule

    def too_long(ctx):
        return F.length("text") > ctx["max_len"]

    spec = TableSpec(
        name="ctx",
        fields=(FieldSpec("text", "string"),),
        row_rules=(
            RowRule(
                "text_budget",
                too_long,
                lambda ctx: f"(length(text) > {ctx['max_len']})",
            ),
        ),
    )
    df = spark.createDataFrame([("short",), ("much longer text",)], "text string")
    strict = compile_spec(spec, {"max_len": 6}).violations_df(df, ["text"])
    lax = compile_spec(spec, {"max_len": 100}).violations_df(df, ["text"])
    assert strict.count() == 1 and lax.count() == 0
    # zero-arg rules keep working unchanged
    spec2 = TableSpec(
        name="ctx2",
        fields=(FieldSpec("text", "string"),),
        row_rules=(RowRule("nonempty", lambda: F.length("text") == 0),),
    )
    assert compile_spec(spec2).violations_df(df, ["text"]).count() == 0


def test_row_rule_default_arg_lambda_is_not_context_taking(spark):
    # the compiler's own default-binding idiom must stay a zero-arg
    # callable (review r2: any-parameter check misfired on it)
    from satya_spark.spec import RowRule

    spec = TableSpec(
        name="defarg",
        fields=(FieldSpec("x", "int"),),
        row_rules=(RowRule("gt_eps", lambda eps=3: F.col("x") > eps),),
    )
    df = spark.createDataFrame([(1,), (9,)], "x int")
    out = compile_spec(spec, {"ignored": True}).violations_df(df, ["x"])
    assert {r["x"] for r in out.collect()} == {9}


def test_scalar_fractional_multiple_of_on_int_column(spark):
    # review r2: int(m) truncated fractional steps on integer dtypes
    spec = TableSpec(
        name="smof", fields=(FieldSpec("n", "long", multiple_of=2.5),)
    )
    df = spark.createDataFrame([(5,), (4,), (10,)], "n long")
    rows = compile_spec(spec).violations_df(df, ["n"]).collect()
    assert {r["n"] for r in rows} == {4}  # 5 and 10 ARE multiples of 2.5


def test_row_rule_context_optin_is_by_parameter_name(spark):
    """review r2: context injection must be an explicit opt-in (param
    named ctx/context). A legacy one-arg fail_fn with another name is
    treated as zero-arg (loud TypeError on evaluation, never silently
    fed the context dict), and non-introspectable callables don't
    crash the signature probe."""
    from satya_spark.compiler import compile_row_rule
    from satya_spark.spec import RowRule

    calls = []

    def legacy(threshold):  # NOT named ctx/context
        calls.append(threshold)
        return F.lit(True)

    compiled = compile_row_rule(RowRule("legacy", legacy), {"max_len": 3})
    with pytest.raises(TypeError):
        compiled.fail  # zero-arg call of a one-arg fn — loud, not silent
    assert calls == []  # the context dict was never fed in

    # C callables without an introspectable signature must not crash
    # the probe (treated as zero-arg)
    compile_row_rule(RowRule("builtin", min), {"a": 1})
