"""Cross-row validation operators (north-rule extensions).

satya validates records independently; these lift its kernels to
table scope (SURVEY.md §2.9):

* :func:`duplicate_keys` — ``unique_items`` (``src/lib.rs:894-906``)
  lifted from list scope to a distributed uniqueness check on a key.
* :func:`referential_violations` — custom-type resolution
  (``src/lib.rs:919-935``) lifted to row↔row referential integrity.
* :func:`column_stats` — per-field error counters
  (``src/satya/profiling.py:15-40``) lifted to column profiles.
* :func:`conv_stats` / :func:`salted_agg` — per-conversation stats
  with explicit salt against hot-key skew.

Scale notes (100 TB design point):

* ``duplicate_keys`` groups on the FULL key ``(conv_id, turn_idx)`` —
  high cardinality, so hash aggregation with map-side partial
  aggregation spreads evenly even when one conv_id is hot; no salt
  needed (the skew unit is conv_id, and turn_idx fans it out).
* per-conversation aggregations group on ``conv_id`` alone — a
  10^9-turn hot conversation would funnel into one reduce task, so
  :func:`salted_agg` does an explicit two-phase (conv_id, salt) →
  conv_id aggregation for the algebraic aggregates we need. For
  plain sum/count Spark's partial aggregation already defuses the
  skew; the salt additionally protects non-partial-friendly aggs and
  keeps reduce-side groups bounded.
* ``referential_violations`` broadcasts the catalog (tool catalogs
  are small by construction) — a shuffle-free map-side anti join.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: Sequence[str]) -> DataFrame:
    """Rows of (key..., dup_count) for keys appearing more than once."""
    return (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def referential_violations(
    df: DataFrame,
    col: str,
    catalog: DataFrame,
    catalog_col: Optional[str] = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Rows whose non-null ``col`` has no match in ``catalog`` —
    broadcast left-anti join (no shuffle on the fact side)."""
    catalog_col = catalog_col or col
    cat = catalog.select(F.col(catalog_col).alias(col)).distinct()
    refs = df.filter(F.col(col).isNotNull()).select(*keys, col)
    return refs.join(F.broadcast(cat), on=col, how="left_anti").select(*keys, col)


def column_stats(
    df: DataFrame, fields: Iterable[str], exact_distinct: bool = False
) -> DataFrame:
    """One output row per field: (field, n_rows, n_null, null_rate,
    n_distinct). Single pass over the data: all per-field aggregates
    are computed in ONE aggregation (no per-field scans), then
    unpivoted driver-side (the aggregate result is a single row).

    ``exact_distinct=False`` uses HLL ``approx_count_distinct`` — at
    10^12 rows an exact distinct per column is a full shuffle per
    field; HLL is a map-side sketch. Exact mode exists for the
    differential oracle.
    """
    fields = list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        aggs.append(F.sum(F.col(f).isNull().cast("long")).alias(f"__null_{f}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(f)).alias(f"__dist_{f}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(f)).alias(f"__dist_{f}"))
    row = df.agg(*aggs)
    spark = df.sparkSession
    # one stack() over the single aggregate row — stays in SQL engine
    stack_args = []
    for f in fields:
        stack_args.append(f"'{f}', __null_{f}, __dist_{f}")
    stacked = row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(fields)}, {', '.join(stack_args)}) AS (field, n_null, n_distinct)"
        ),
    )
    return stacked.select(
        "field",
        "n_rows",
        "n_null",
        (F.col("n_null").cast("double") / F.col("n_rows")).alias("null_rate"),
        "n_distinct",
    )


def null_rate_violations(
    df: DataFrame, field: str, max_null_rate: float
) -> DataFrame:
    """Table-level null-rate rule for one column → 0-or-1 row
    (field, null_rate, max_null_rate)."""
    return (
        df.agg(
            (F.sum(F.col(field).isNull().cast("long")) / F.count(F.lit(1))).alias(
                "null_rate"
            )
        )
        .select(
            F.lit(field).alias("field"),
            "null_rate",
            F.lit(max_null_rate).alias("max_null_rate"),
        )
        .filter(F.col("null_rate") > max_null_rate)
    )


def salted_agg(
    df: DataFrame,
    group_col: str,
    partials: dict[str, Column],
    finals: dict[str, Column],
    salt_buckets: int = 32,
    salt_source: str = "turn_idx",
) -> DataFrame:
    """Two-phase skew-safe aggregation (north rule: 'salted
    repartitioning on conv_id to defuse hot-conversation skew').

    Phase 1 groups by (group_col, salt) where salt = pmod(hash of a
    fine-grained column, salt_buckets) — a hot group fans out over
    ``salt_buckets`` reduce tasks. Phase 2 combines the per-salt
    partials per group (each group now contributes ≤ salt_buckets
    rows, trivially cheap).

    ``partials``: name -> aggregate over raw rows (phase 1).
    ``finals``:  name -> aggregate over phase-1 partial columns.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    p1 = (
        df.withColumn("__salt", salt)
        .groupBy(group_col, "__salt")
        .agg(*[c.alias(n) for n, c in partials.items()])
    )
    return p1.groupBy(group_col).agg(*[c.alias(n) for n, c in finals.items()])


def auto_salt_buckets(
    df: DataFrame, group_col: str = "conv_id", target_group_rows: int = 1_000_000
) -> int:
    """Salt-factor heuristic (SURVEY.md §7.6): one cheap sketch pass
    — rows / approx distinct groups estimates the MEAN group size;
    the salt is sized so even a group 100× the mean stays under
    ``target_group_rows`` per (group, salt) reduce task. Clamped to
    [1, 256]; 1 means salting is skipped entirely."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(group_col).alias("d"),
    ).collect()[0]
    n, d = row["n"], max(row["d"], 1)
    mean = n / d
    hot_estimate = mean * 100
    buckets = int(hot_estimate // target_group_rows) + 1
    return max(1, min(256, buckets))


def conv_stats(df: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Per-conversation stats for drift checks: n_turns, max_turn_idx,
    sum/avg text length. avg is computed as exact-integer sum / count
    (deterministic across partition orders — no float summation)."""
    out = salted_agg(
        df,
        "conv_id",
        partials={
            "pc": F.count(F.lit(1)),
            "pmax": F.max("turn_idx"),
            "plen": F.sum(F.coalesce(F.length("text"), F.lit(0))),
        },
        finals={
            "n_turns": F.sum("pc"),
            "max_turn_idx": F.max("pmax"),
            "sum_text_len": F.sum("plen"),
        },
        salt_buckets=salt_buckets,
    )
    return out.withColumn(
        "avg_text_len",
        F.round(F.col("sum_text_len").cast("double") / F.col("n_turns"), 4),
    )
