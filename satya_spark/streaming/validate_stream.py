"""Streaming validation — the ``validate_stream`` /
``validate_ndjson_bytes_streaming`` analog (reference
``src/satya/validator.py:376-390``; ``src/lib.rs:501-549``) on
Structured Streaming.

satya's streaming tier is an iterator protocol with 8 KB chunking;
ours is ``readStream`` over NDJSON/parquet directories: the same
compiled kernel expressions run per micro-batch (compile once,
validate forever — the class-level validator cache,
``src/satya/__init__.py:326-328``, is simply the closure here).

Beyond the reference (north-rule era additions): event-time
watermarks + windowed violation-rate aggregation for late data, and
``foreachBatch`` fan-out writing verdicts + violations per batch —
the streaming twin of the batch manifest.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler import CompiledSpec, compile_spec
from ..spec import TableSpec


def read_ndjson_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Streaming NDJSON source with per-line parse verdicts
    (PERMISSIVE corrupt-record column, like the batch reader)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.withColumn("json_ok", F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )


def annotate_stream(stream_df: DataFrame, spec: TableSpec) -> DataFrame:
    """Apply the compiled kernels to a streaming frame — identical
    expressions as batch; Spark streams them per micro-batch."""
    compiled = compile_spec(spec)
    out = stream_df.withColumn("violations", compiled.violations_array_col())
    return out.withColumn("valid", F.size("violations") == 0)


def windowed_violation_counts(
    annotated: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed violation rates with late-data handling:
    counts per (window, validity) — the streaming drift/verdict
    signal. Watermark bounds state (run-forever safe)."""
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
            F.sum(F.size("violations").cast("long")).alias("n_rule_violations"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_rows",
            "n_invalid",
            "n_rule_violations",
        )
    )


def run_stream_to_sink(
    annotated: DataFrame,
    verdict_path: str,
    violations_path: str,
    checkpoint: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    trigger_available_now: bool = True,
):
    """foreachBatch sink: per micro-batch, append shard-style verdict
    counts and exploded violation rows (the streaming manifest)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            (
                batch_df.agg(
                    F.lit(batch_id).alias("batch_id"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
                ).write.mode("append").parquet(verdict_path)
            )
            (
                batch_df.filter(F.size("violations") > 0)
                .select(*key_cols, F.explode("violations").alias("v"))
                .select(*key_cols, "v.field", "v.constraint_name", "v.offending_value")
                .write.mode("append")
                .parquet(violations_path)
            )
        finally:
            batch_df.unpersist()

    writer = annotated.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_split(
    annotated: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_available_now: bool = True,
):
    """Streaming quarantine split — the streaming twin of
    :meth:`ValidationEngine.write_split` (one-pass batch split).

    Routes every micro-batch's rows into the SAME hive-partitioned
    layout as the batch split: valid rows land under
    ``<path>/valid=true``, invalid rows (with their populated
    ``violations`` array) under ``<path>/valid=false`` — so
    :func:`satya_spark.io.read_split` reads either side of a
    streaming run unchanged, partition-pruned to one side's files.

    Uses the NATIVE file sink (``writeStream.partitionBy('valid')``),
    not ``foreachBatch``: the file sink's ``_spark_metadata``
    transaction log gives exactly-once file visibility across
    restarts (a batch reader only sees files the log committed), and
    the write stays one pass per micro-batch with no driver-side
    branching. At 10^12 turns this is the continuous-ingest shape:
    upstream appends transcript files, this query keeps the clean
    side append-only consumable while quarantined rows carry their
    violation evidence (field, constraint, offending value) for
    triage.
    """
    writer = (
        annotated.writeStream.partitionBy("valid")
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_value_histograms(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    width: float = 200.0,
    n_buckets: int = 20,
) -> DataFrame:
    """Event-time windowed fixed-grid histograms of a metric — the
    streaming half of the drift tier. One watermarked
    groupBy(window, bucket).count(): state is bounded by
    windows-in-flight × n_buckets (tiny), late rows fold into their
    window until the watermark closes it. Output: (window_start,
    window_end, bucket, n)."""
    from ..drift import bucketize

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window),
            bucketize(F.col(value_col), width, n_buckets).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "bucket",
            "n",
        )
    )


def window_psi_vs_reference(
    hist_batch: DataFrame,
    ref_hist: list[int] | tuple[int, ...],
    n_buckets: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-window PSI of streamed histograms against a STATIC
    reference histogram (e.g. last week's accepted distribution,
    shipped as n_buckets ints — plan constants, no join against
    data). Meant for ``foreachBatch`` over
    :func:`windowed_value_histograms` output: each batch re-scores
    the windows it contains; a window's PSI is final once the
    watermark closes it. Exact grid completion: the batch frame is
    cross-joined with an n_buckets literal grid (tiny × tiny), so
    buckets absent from a window contribute their full
    (p+ε)·ln((p+ε)/ε) term exactly like drift.psi_pair. Output:
    (window_start, psi, n_rows) — alert on psi > 0.2 downstream."""
    spark = hist_batch.sparkSession
    ref_total = max(sum(ref_hist), 1)
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    wins = hist_batch.select("window_start").distinct()
    full = (
        wins.crossJoin(grid)
        .join(
            hist_batch.select("window_start", "bucket", "n"),
            ["window_start", "bucket"],
            "left",
        )
        .fillna(0, subset=["n"])
    )
    totals = full.groupBy("window_start").agg(F.sum("n").alias("t_cur"))
    r = full.join(totals, "window_start")
    # reference proportions folded in as a CASE over bucket id
    p_expr = None
    for b in range(n_buckets):
        cond = F.col("bucket") == b
        val = F.lit(ref_hist[b] / ref_total)
        p_expr = F.when(cond, val) if p_expr is None else p_expr.when(cond, val)
    p = p_expr.otherwise(F.lit(0.0)) + F.lit(eps)
    q = F.col("n").cast("double") / F.greatest(F.col("t_cur"), F.lit(1)) + F.lit(eps)
    contrib = (p - q) * F.log(p / q)
    return (
        r.groupBy("window_start")
        .agg(
            F.round(F.sum(contrib), 6).alias("psi"),
            F.sum("n").alias("n_rows"),
        )
        .orderBy("window_start")
    )
