"""Driver-contract sanity: entry() runs, queries()/oracle_sql() keys
line up, and a fast DuckDB differential check passes at sf0.001 (the
full sf0.01 gate runs via scripts/check_correctness.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"field", "constraint_name", "n"}


def test_query_oracle_keys_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # round 2: every query is fully oracled — approximate search via
    # embedded plane/centroid constants, the multimodal featurizer
    # reconstructed in SQL. Keep it that way.
    assert set(qs) - set(os_) == set()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize(
    "name",
    ["row_violations", "row_verdicts", "unique_key", "referential",
     "conv_stats", "drift_psi", "coercions"],
)
def test_differential_oracle_sf0001(spark, duck, name):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.check_correctness import normalize

    sdf = entrymod.queries()[name](spark, SF)
    scols, srows = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = duck.execute(entrymod.oracle_sql()[name])
    dcols, drows = normalize([d[0] for d in cur.description], cur.fetchall())
    assert scols == dcols
    assert srows == drows


def test_arrow_gates_actually_run_arrow(spark):
    """The declared 100 TB configs must be the gated ones (VERDICT r2):
    q_dedup_embedding and q_ann_ivf_arrow execute the numpy mapInPandas
    path (ArrowEval/MapInPandas in the plan); the expr twins stay pure
    Catalyst (no Python eval anywhere)."""

    def plan(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def has_py_boundary(p: str) -> bool:
        # r6: the numpy kernels run as MapInArrow (guide §4.1 — no
        # pandas boxing); accept any Python-eval node spelling
        return (
            "MapInArrow" in p
            or "MapInPandas" in p
            or "ArrowEvalPython" in p
        )

    arrow_emb = plan(entrymod.queries()["dedup_embedding"](spark, SF))
    assert has_py_boundary(arrow_emb)
    expr_emb = plan(entrymod.queries()["dedup_embedding_expr"](spark, SF))
    assert not has_py_boundary(expr_emb) and "EvalPython" not in expr_emb
    arrow_ivf = plan(entrymod.queries()["ann_ivf_arrow"](spark, SF))
    assert has_py_boundary(arrow_ivf)
    expr_ivf = plan(entrymod.queries()["ann_ivf_pruned"](spark, SF))
    assert not has_py_boundary(expr_ivf) and "EvalPython" not in expr_ivf
