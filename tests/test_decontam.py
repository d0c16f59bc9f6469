"""Benchmark decontamination: unit semantics, DuckDB differential
parity on the documents fixture, broadcast plan pin, threshold
drop-list."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from satya_spark.functions.decontam import (
    contaminated_ids,
    contamination_report,
    contamination_report_sql,
    word_ngrams,
)

DOCS = [
    (1, "a b c d e f g h i j"),
    (2, "x y z"),
    (3, "c d e f g h i j k"),
]
BENCH = [("c d e f g h i j q r s",)]


def test_word_ngrams_short_text_empty(spark):
    # null text -> [] too (size(null) >= n is null -> otherwise branch),
    # matching the DuckDB twin (CASE NULL -> ELSE [])
    df = spark.createDataFrame([("a b c",), ("",), (None,)], ["text"])
    got = df.select(word_ngrams(F.col("text"), 8).alias("g")).collect()
    assert [r["g"] for r in got] == [[], [], []]


def test_report_unit(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["share"])
        for r in contamination_report(docs, bench, n=8).collect()
    }
    # doc 1 has grams {abcdefgh, bcdefghi, cdefghij}; bench contains
    # cdefghij (and defghijq... which no doc has) -> 1 hit of 3.
    # doc 3 has {cdefghij, defghijk} -> 1 hit of 2. doc 2: no grams.
    assert got == {1: (3, 1, 0.333333), 3: (2, 1, 0.5)}


def test_contaminated_ids_threshold(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["text"])
    ids = {r["doc_id"] for r in contaminated_ids(docs, bench, n=8).collect()}
    assert ids == {1, 3}
    ids2 = {
        r["doc_id"]
        for r in contaminated_ids(docs, bench, n=8, min_hits=2).collect()
    }
    assert ids2 == set()


SF = "/root/testdata/sf0.001"


def test_report_duckdb_parity_on_documents(spark):
    """Full differential on the driver documents fixture + the
    derived eval suite (the same pair the gate runs)."""
    sf_dir = SF
    from satya_spark.docfix import (
        docs_from_testdata,
        eval_suite_from_testdata,
        docs_with_clause,
        eval_cte,
    )

    docs = docs_from_testdata(spark, sf_dir)
    bench = eval_suite_from_testdata(spark, sf_dir)
    got = sorted(
        (r["doc_id"], r["n_grams"], r["n_hit"], r["share"])
        for r in contamination_report(docs, bench).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = (
        docs_with_clause()
        + ", "
        + eval_cte("duckdb")
        + "\n"
        + contamination_report_sql("docs", "eval_suite")
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    assert len(got) > 0  # planted contamination actually hits


def test_report_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["text"])
    out = contamination_report(docs, bench, n=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_report_shuffle_join_variant(spark):
    """broadcast=False: same values, shuffle-join plan (the
    corpus-vs-corpus configuration)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["text"])
    a = sorted(map(tuple, contamination_report(docs, bench, n=8).collect()))
    b = sorted(
        map(tuple, contamination_report(docs, bench, n=8, broadcast=False).collect())
    )
    assert a == b
