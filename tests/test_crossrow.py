"""Cross-row operators: distributed uniqueness, referential
integrity, column stats, salted per-conversation aggregation
(SURVEY.md §2.9, FIXTURES.md F2 v_unique / v_ref).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from satya_spark import crossrow
from satya_spark.transcripts import synthesize, synthesize_tool_catalog


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c1", 1), ("c2", 0), ("c2", 0), ("c2", 0)],
        ["conv_id", "turn_idx"],
    )
    dups = {
        (r["conv_id"], r["turn_idx"]): r["dup_count"]
        for r in crossrow.duplicate_keys(df, ["conv_id", "turn_idx"]).collect()
    }
    assert dups == {("c1", 1): 2, ("c2", 0): 3}


def test_referential_violations(spark):
    df = spark.createDataFrame(
        [("c1", 0, "tool_1"), ("c1", 1, None), ("c2", 0, "ghost")],
        ["conv_id", "turn_idx", "tool"],
    )
    cat = spark.createDataFrame([("tool_1",)], ["tool"])
    out = crossrow.referential_violations(
        df, "tool", cat, keys=["conv_id", "turn_idx"]
    ).collect()
    assert [(r["conv_id"], r["tool"]) for r in out] == [("c2", "ghost")]


def test_referential_is_broadcast(spark):
    df = synthesize(spark, n_conv=50)
    cat = synthesize_tool_catalog(spark)
    out = crossrow.referential_violations(df, "tool", cat)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_column_stats(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], ["x"]
    )
    row = crossrow.column_stats(df, ["x"], exact_distinct=True).collect()[0]
    assert row["n_rows"] == 4
    assert row["n_null"] == 1
    assert abs(row["null_rate"] - 0.25) < 1e-9
    assert row["n_distinct"] == 2


def test_null_rate_violation_fires(spark):
    df = spark.createDataFrame([(None,), (None,), ("x",)], ["tool"])
    out = crossrow.null_rate_violations(df, "tool", 0.5).collect()
    assert len(out) == 1 and out[0]["field"] == "tool"
    ok = crossrow.null_rate_violations(df, "tool", 0.9).collect()
    assert ok == []


def test_salted_conv_stats_matches_plain(spark):
    """Two-phase salted aggregation must be result-identical to the
    direct groupBy — including on the synthesized hot conversation."""
    df = synthesize(spark, n_conv=200, hot_factor=500)
    salted = {
        r["conv_id"]: (r["n_turns"], r["max_turn_idx"], r["sum_text_len"])
        for r in crossrow.conv_stats(df, salt_buckets=8).collect()
    }
    plain = {
        r["conv_id"]: (r["n_turns"], r["max_turn_idx"], r["sum_text_len"])
        for r in df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_text_len"),
        )
        .collect()
    }
    assert salted == plain
    assert salted["c0"][0] == 500  # hot conversation fully counted
