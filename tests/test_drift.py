"""Drift kernels (PSI, binned KS): identical populations score ~0,
shifted populations exceed threshold (FIXTURES.md F4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from satya_spark import drift


def _hist(spark, values, width=1.0, n=10):
    df = spark.createDataFrame([(float(v),) for v in values], ["m"])
    return drift.histogram(df, "m", width, n)


def test_identical_populations_no_drift(spark):
    vals = [0.5, 1.5, 2.5, 3.5, 4.5] * 20
    h1 = _hist(spark, vals)
    h2 = _hist(spark, vals)
    assert drift.psi_total(drift.psi(h1, h2, 10)) < 1e-6
    assert drift.ks_binned(h1, h2, 10).collect()[0]["ks_stat"] < 1e-9


def test_shifted_population_drifts(spark):
    ref = [1.5] * 50 + [2.5] * 50
    cur = [5.5] * 50 + [6.5] * 50  # hard shift
    h1 = _hist(spark, ref)
    h2 = _hist(spark, cur)
    assert drift.psi_total(drift.psi(h1, h2, 10)) > 0.5
    assert drift.ks_binned(h1, h2, 10).collect()[0]["ks_stat"] > 0.9


def test_mild_resample_does_not_drift(spark):
    # same distribution, different sample -> tiny PSI
    ref = [1.5] * 52 + [2.5] * 48
    cur = [1.5] * 49 + [2.5] * 51
    h1 = _hist(spark, ref)
    h2 = _hist(spark, cur)
    assert drift.psi_total(drift.psi(h1, h2, 10)) < 0.05
    assert drift.ks_binned(h1, h2, 10).collect()[0]["ks_stat"] < 0.05


def test_bucketize_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.0,), (1e9,)], ["m"])
    rows = df.select(drift.bucketize(F.col("m"), 10.0, 5).alias("b")).collect()
    assert [r["b"] for r in rows] == [0, 0, 4, 4]
