"""Conversation-structure validation: unit semantics, DuckDB
differential parity (same rows through the SQL twin), fuzzed parity
on random conversations, and the single-Exchange plan pin."""

from __future__ import annotations

import random

import duckdb
import pytest

from satya_spark.convcheck import (
    conversation_structure_sql,
    conversation_structure_violations,
)

ROWS = [
    ("c1", 0, "system", None),
    ("c1", 1, "user", None),
    ("c1", 2, "assistant", "tool_1"),
    ("c1", 4, "user", None),          # gap
    ("c2", 1, "user", None),          # first turn nonzero
    ("c2", 1, "user", None),          # duplicate + repeated role
    ("c2", 2, "system", None),        # system not first
    ("c2", 3, "moderator", "tool_2"),  # unknown role + tool on bad role
    ("c3", None, "user", None),       # null idx
    ("c3", 0, "user", "tool_3"),      # tool on user
    ("c3", 1, "user", None),          # repeated role
]
SCHEMA = "conv_id string, turn_idx int, role string, tool string"

EXPECTED = {
    ("c1", 4, "user", "turn_gap"),
    ("c2", 1, "user", "first_turn_nonzero"),
    ("c2", 1, "user", "duplicate_turn_idx"),
    ("c2", 1, "user", "repeated_role"),
    ("c2", 2, "system", "system_not_first"),
    ("c2", 3, "moderator", "role_unknown"),
    ("c2", 3, "moderator", "tool_on_invalid_role"),
    ("c3", None, "user", "turn_idx_null"),
    ("c3", 0, "user", "tool_on_invalid_role"),
    ("c3", 1, "user", "repeated_role"),
}


def _norm(tuples):
    return sorted(tuple("NULL" if v is None else str(v) for v in t) for t in tuples)


def _spark_rows(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = conversation_structure_violations(df)
    return _norm(
        (r["conv_id"], r["turn_idx"], r["role"], r["constraint_name"])
        for r in out.collect()
    )


def _duck_rows(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tr (conv_id VARCHAR, turn_idx INTEGER, "
        "role VARCHAR, tool VARCHAR)"
    )
    con.executemany("INSERT INTO tr VALUES (?, ?, ?, ?)", rows)
    return _norm(con.execute(conversation_structure_sql("tr")).fetchall())


def test_structure_unit(spark):
    got = _spark_rows(spark, ROWS)
    assert set(got) == set(_norm(EXPECTED))
    assert len(got) == len(EXPECTED)  # no double-emits


def test_structure_duckdb_parity(spark):
    assert _spark_rows(spark, ROWS) == _duck_rows(ROWS)


def test_structure_fuzz_parity(spark):
    """Random conversations with every corruption class present;
    value parity Spark vs DuckDB. Ties in turn_idx are only emitted
    on identical rows by construction (matching the transcript
    fixture's duplicate-row planting), so lag is value-deterministic
    in both engines."""
    rng = random.Random(20260817)
    rows = []
    for c in range(60):
        conv = f"f{c}"
        n = rng.randint(1, 9)
        idx = 0 if rng.random() < 0.8 else rng.randint(1, 3)
        for t in range(n):
            role = rng.choice(
                ["system", "user", "assistant", "tool", "moderator", None]
            )
            tool = rng.choice([None, None, "tool_a", "tool_b"])
            rows.append((conv, idx, role, tool))
            if rng.random() < 0.15:  # duplicate the identical row
                rows.append((conv, idx, role, tool))
            idx += rng.choice([1, 1, 1, 2, 3])
        if rng.random() < 0.1:
            rows.append((conv, None, "user", None))
    assert _spark_rows(spark, rows) == _duck_rows(rows)


def test_structure_single_exchange(spark):
    """The sequence checks must cost exactly ONE shuffle (the
    conv_id window); the null-idx branch is a narrow filter."""
    from satya_spark.transcripts import synthesize

    df = synthesize(spark, 3000)
    out = conversation_structure_violations(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints the tree twice (Final + Initial) — count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_structure_clean_conversation_empty(spark):
    rows = [
        ("ok", 0, "system", None),
        ("ok", 1, "user", None),
        ("ok", 2, "assistant", "tool_1"),
        ("ok", 3, "tool", "tool_1"),
        ("ok", 4, "assistant", None),
        ("ok", 5, "user", None),
    ]
    assert _spark_rows(spark, rows) == []


def test_repeated_turn_groups(spark):
    """Repeated turn text flags within a conversation only; NULL
    texts never group; same-index duplicate rows count as repeats."""
    from satya_spark.convcheck import repeated_turn_groups

    rows = [
        ("a", 0, "hello"), ("a", 1, "world"), ("a", 2, "hello"),
        ("a", 3, "hello"),
        ("b", 0, "hello"),                      # cross-conv: no repeat
        ("b", 1, None), ("b", 2, None),          # nulls excluded
        ("c", 0, "dup row"), ("c", 0, "dup row"),  # same-idx dup rows
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv_id"]: r for r in repeated_turn_groups(df).collect()}
    assert set(out) == {"a", "c"}
    a = out["a"]
    assert (a["n_occurrences"], a["first_turn_idx"], a["last_turn_idx"]) == (3, 0, 3)
    c = out["c"]
    assert (c["n_occurrences"], c["first_turn_idx"], c["last_turn_idx"]) == (2, 0, 0)
