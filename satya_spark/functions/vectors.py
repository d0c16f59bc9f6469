"""Embedding-column validation kernels — the pre-flight check an
embeddings table needs before ANN / SemDeDup / embedding near-dup
(functions/similarity.py) will behave: a single NaN poisons every
cosine it touches, a wrong-dimension vector breaks batched matmuls,
and unnormalized rows silently skew cosine thresholds.

Extends the engine's violation-row contract (satya's error
accumulation, ``src/satya/validator.py:219-275``: every violation
reported, never fail-fast) to ``array<float>`` columns: one output
row per (vector, violated constraint) with the constraint name and a
portable offending-value rendering.

Checks, each independently guarded so one defect never masks a
different check (but norm checks require a clean finite vector,
since a NaN/null item makes the norm meaningless):

* ``null_vector`` — the column itself is NULL
* ``wrong_dim`` — ``size(vec) != dim`` (offending = actual size)
* ``null_item`` — an element is NULL
* ``non_finite`` — an element is NaN or ±Inf (only on null-free vecs)
* ``norm_low`` / ``norm_high`` — L2 norm outside [norm_min, norm_max]
  (only on non-empty, null-free, finite vecs; offending = the norm
  through ``round(·, 6)`` + DECIMAL(28,6) so Spark and DuckDB render
  the same string)

100 TB shape: everything is per-row expression work inside
whole-stage codegen — higher-order functions (``exists``,
``aggregate``, ``transform``), no UDF, no shuffle, no state. The
output is violations-only, so a clean corpus emits nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


def _l2(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _norm_str(norm: Column) -> Column:
    # round + DECIMAL(28,6): identical rendering in Spark and DuckDB
    # (raw double->string formatting differs between the engines).
    # Overflow guard (ADVICE r5): a finite float32 vector can have an
    # L2 norm ≳1e22, and under ANSI mode the DECIMAL(28,6) cast would
    # THROW and abort the whole validation job — violating the
    # never-fail-fast violation-row contract. Values beyond the
    # decimal's range render as a sentinel instead (the norm_min/max
    # bounds that fire here are always tiny by comparison, so real
    # deployments never see it; the oracle twin's range is identical).
    return F.when(
        F.abs(norm) < F.lit(1e22),
        F.round(norm, 6).cast("decimal(28,6)").cast("string"),
    ).otherwise(F.lit(">1e22"))


def vector_violations(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    norm_min: float | None = None,
    norm_max: float | None = None,
) -> DataFrame:
    """Violation rows (id, constraint_name, offending_value) for an
    embedding column — see the module docstring for the check
    battery. Constraints whose parameter is None are skipped."""
    v = F.col(vec_col)
    has_null_item = F.exists(v, lambda x: x.isNull())
    non_finite = F.exists(
        v, lambda x: F.isnan(x) | (F.abs(x) == F.lit(_INF))
    )
    clean = v.isNotNull() & ~has_null_item & ~non_finite
    norm = _l2(v)

    def viol(cond: Column, name: str, off: Column) -> Column:
        return F.when(
            cond,
            F.struct(
                F.lit(name).alias("constraint_name"),
                off.alias("offending_value"),
            ),
        )

    checks = [
        viol(v.isNull(), "null_vector", F.lit("null")),
        viol(
            v.isNotNull() & has_null_item, "null_item", F.lit("null item")
        ),
        viol(
            v.isNotNull() & ~has_null_item & non_finite,
            "non_finite",
            F.lit("non-finite item"),
        ),
    ]
    if dim is not None:
        checks.insert(
            1,
            viol(
                v.isNotNull() & (F.size(v) != dim),
                "wrong_dim",
                F.size(v).cast("string"),
            ),
        )
    if norm_min is not None:
        checks.append(
            viol(
                clean & (F.size(v) > 0) & (norm < F.lit(float(norm_min))),
                "norm_low",
                _norm_str(norm),
            )
        )
    if norm_max is not None:
        checks.append(
            viol(
                clean & (F.size(v) > 0) & (norm > F.lit(float(norm_max))),
                "norm_high",
                _norm_str(norm),
            )
        )
    fired = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return df.select(
        F.col(id_col), F.explode(fired).alias("__v")
    ).select(
        id_col,
        F.col("__v.constraint_name").alias("constraint_name"),
        F.col("__v.offending_value").alias("offending_value"),
    )


def vector_violations_sql(
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    norm_min: float | None = None,
    norm_max: float | None = None,
) -> str:
    """DuckDB twin of :func:`vector_violations` (UNION ALL of the
    per-check selects — same guards, same offending renderings)."""
    v = vec_col
    has_null_item = f"len(list_filter({v}, x -> x IS NULL)) > 0"
    non_finite = f"len(list_filter({v}, x -> isnan(x) OR isinf(x))) > 0"
    norm = (
        f"sqrt(list_sum(list_transform({v},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    norm_str = f"CAST(CAST(round({norm}, 6) AS DECIMAL(28,6)) AS VARCHAR)"
    clean = f"{v} IS NOT NULL AND NOT ({has_null_item}) AND NOT ({non_finite})"
    parts = [
        f"SELECT {id_col}, 'null_vector' AS constraint_name,"
        f" 'null' AS offending_value FROM {table} WHERE {v} IS NULL"
    ]
    if dim is not None:
        parts.append(
            f"SELECT {id_col}, 'wrong_dim', CAST(len({v}) AS VARCHAR)"
            f" FROM {table} WHERE {v} IS NOT NULL AND len({v}) != {dim}"
        )
    parts.append(
        f"SELECT {id_col}, 'null_item', 'null item' FROM {table}"
        f" WHERE {v} IS NOT NULL AND ({has_null_item})"
    )
    parts.append(
        f"SELECT {id_col}, 'non_finite', 'non-finite item' FROM {table}"
        f" WHERE {v} IS NOT NULL AND NOT ({has_null_item}) AND ({non_finite})"
    )
    if norm_min is not None:
        parts.append(
            f"SELECT {id_col}, 'norm_low', {norm_str} FROM {table}"
            f" WHERE {clean} AND len({v}) > 0 AND {norm} < {norm_min}"
        )
    if norm_max is not None:
        parts.append(
            f"SELECT {id_col}, 'norm_high', {norm_str} FROM {table}"
            f" WHERE {clean} AND len({v}) > 0 AND {norm} > {norm_max}"
        )
    return " UNION ALL ".join(parts)
