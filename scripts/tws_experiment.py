"""One-off experiment: stateful-runtime comparison at reduced scale.

Times the three stateful layouts (applyInPandasWithState packed
buckets, transformWithState per-conv MapState entries, tws packed
arrays) over the same synthetic stream, plus a point-op microbench
(getValue/updateValue round-trip vs iterator() page amortization) so
BENCH.md can state measured per-op costs instead of guesses.

Usage: python scripts/tws_experiment.py [n_conv]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _state_op_microbench(spark, tmp_root: str, n_entries: int = 4096) -> dict:
    """Measure MapState per-op costs inside a REAL transformWithState
    query (the only place the state-server RPC path exists): seed
    n_entries conv entries, then time point getValue round-trips vs
    one full iterator() pass. Emits one row of microsecond timings."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class ProbeProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._convs = handle.getMapState(
                "convs", "conv_id string", "max_turn int, seen array<int>, capped boolean"
            )

        def handleInputRows(self, key, rows, timerValues):
            for _ in rows:
                pass
            val = (5, [0, 1, 2, 3, 4], False)
            t0 = time.perf_counter()
            for i in range(n_entries):
                self._convs.updateValue((f"conv{i:07d}",), val)
            t_write = time.perf_counter() - t0
            n_reads = min(1024, n_entries)
            t0 = time.perf_counter()
            for i in range(n_reads):
                self._convs.getValue((f"conv{i:07d}",))
            t_point = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_scanned = sum(1 for _ in self._convs.iterator())
            t_bulk = time.perf_counter() - t0
            yield pd.DataFrame(
                [
                    (
                        n_entries,
                        round(t_write / n_entries * 1e6, 2),
                        round(t_point / n_reads * 1e6, 2),
                        round(t_bulk / max(n_scanned, 1) * 1e6, 2),
                    )
                ],
                columns=["n_entries", "write_us", "point_read_us", "bulk_read_us"],
            )

        def close(self) -> None:
            pass

    in_dir = os.path.join(tmp_root, "probe_in")
    spark.createDataFrame([("g", 0)], "grp string, v int").write.mode(
        "overwrite"
    ).parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    out_dir = os.path.join(tmp_root, "probe_out")
    q = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .groupBy("grp")
        .transformWithStateInPandas(
            ProbeProcessor(),
            outputStructType=(
                "n_entries int, write_us double, "
                "point_read_us double, bulk_read_us double"
            ),
            outputMode="append",
            timeMode="none",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp_root, "probe_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    row = spark.read.parquet(out_dir).collect()[0]
    return {
        "state_op_n_entries": row["n_entries"],
        "state_op_write_us": row["write_us"],
        "state_op_point_read_us": row["point_read_us"],
        "state_op_bulk_read_us": row["bulk_read_us"],
    }


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 90000
    from satya_spark.session import get_spark
    from satya_spark.streaming.tws_support import (
        ROCKSDB_PROVIDER,
        ensure_protobuf_pythonpath,
        tws_available,
    )

    ensure_protobuf_pythonpath()
    spark = get_spark(app_name="tws-exp", cpus=32)
    from satya_spark.streaming.stateful import stateful_turn_checks
    from satya_spark.streaming.stateful_tws import stateful_turn_checks_tws
    from satya_spark.transcripts import synthesize

    tmp_root = tempfile.mkdtemp(prefix="tws_exp_")
    in_dir = os.path.join(tmp_root, "in")
    synthesize(spark, n_conv=n_conv, partitions=8).write.mode("overwrite").parquet(
        in_dir
    )
    schema = spark.read.parquet(in_dir).schema
    n_rows = spark.read.parquet(in_dir).count()

    def solo(tag, build):
        ck = os.path.join(tmp_root, f"ck_{tag}")
        op = os.path.join(tmp_root, f"out_{tag}")
        t0 = time.monotonic()
        q = (
            build(spark.readStream.schema(schema).parquet(in_dir))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", op)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(900)
        return time.monotonic() - t0

    out = {"n_conv": n_conv, "n_rows": n_rows}
    t = solo("aipws", lambda s: stateful_turn_checks(s, bucket_by=4096))
    out["aipws_rows_per_sec"] = round(n_rows / t)
    out["aipws_sec"] = round(t, 2)
    if tws_available():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        # adaptive default: a drain touches ≈ all resident convs, so
        # the fraction heuristic picks the bulk iterator read
        t = solo("tws_map", lambda s: stateful_turn_checks_tws(s, bucket_by=4096))
        out["tws_map_rows_per_sec"] = round(n_rows / t)
        out["tws_map_sec"] = round(t, 2)
        # forced point reads: the steady-state sparse-touch code path,
        # exercised here at drain density to expose the per-RPC cost
        t = solo(
            "tws_map_point",
            lambda s: stateful_turn_checks_tws(
                s, bucket_by=4096, dense_read_fraction=float("inf")
            ),
        )
        out["tws_map_point_rows_per_sec"] = round(n_rows / t)
        out["tws_map_point_sec"] = round(t, 2)
        t = solo(
            "tws_packed",
            lambda s: stateful_turn_checks_tws(s, bucket_by=4096, layout="packed"),
        )
        out["tws_packed_rows_per_sec"] = round(n_rows / t)
        out["tws_packed_sec"] = round(t, 2)
        out.update(_state_op_microbench(spark, tmp_root))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
