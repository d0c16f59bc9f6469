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
