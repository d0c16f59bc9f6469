"""Table layout helpers for the 100 TB design point.

Bucketing is the sandbox stand-in for Iceberg's bucket partition
transform (the real deployment target named by the north rule): write
the transcript table bucketed by ``conv_id`` and every downstream
per-conversation aggregation and self-join runs WITHOUT a shuffle —
the bucket join/agg reads co-located data. The resume manifest's
shard function (pmod(xxhash64(conv_id), n)) is deliberately the same
family, so manifest-filtering prunes whole buckets.

At 10^12 turns the difference is the whole game: an unbucketed
groupBy(conv_id) shuffles the full table; a bucketed one shuffles
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 64,
    sort_col: str | None = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.
    Sorting within buckets by turn_idx gives cheap stable
    (conv_id, turn_idx) ordering — the per-turn text-equality
    invariant's physical layout."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def read_split(
    spark: SparkSession, path: str, side: str = "clean", fmt: str = "parquet"
) -> DataFrame:
    """Read one side of a :meth:`ValidationEngine.write_split` layout.
    ``side`` is ``"clean"`` (valid=true) or ``"quarantine"``
    (valid=false). Reads the partition ROOT and filters on the
    partition column, so the scan is partition-pruned to the one
    side's files — a fully-clean run simply yields an empty
    quarantine frame (its ``valid=false`` directory was never
    created, and pruning selects zero files)."""
    if side not in ("clean", "quarantine"):
        raise ValueError(f"side must be 'clean' or 'quarantine', got {side!r}")
    df = spark.read.format(fmt).load(path)
    return df.filter(df["valid"] == (side == "clean"))
