"""transformWithStateInPandas variant of the stateful turn checks.

Same per-conversation verdict semantics as
:mod:`satya_spark.streaming.stateful` (duplicate / regressed turn
detection against accumulated per-conversation history — the operator
satya's record-scope validators can't express and Spark's built-in
streaming aggregations can't emit row verdicts for), but on Spark 4's
``transformWithState`` runtime instead of ``applyInPandasWithState``:

* State lives in the **RocksDB state-store provider** (required by
  transformWithState) instead of the HDFS-backed in-memory map —
  state size is bounded by disk, not executor heap, and commits are
  incremental (changelog), the configuration a 10^12-turn stream
  actually needs.
* The bucketed configuration keeps one state GROUP per hash bucket
  (amortizing per-group dispatch exactly like the
  applyInPandasWithState variant) but holds each conversation as its
  own **MapState entry** — a point read/write per touched
  conversation, instead of rewriting the whole bucket's packed
  arrays every micro-batch. At 10^5 convs/bucket with 10 touched per
  batch, the applyInPandasWithState variant re-serializes all 10^5
  every commit; this one touches 10.

Semantics parity with the applyInPandasWithState operator is pinned
in tests/test_stateful_streaming.py (same inputs → identical verdict
sets through both runtimes).

Caveats (honest): idle-state eviction here would use per-key TTL
(``ttlDurationMs`` on the state handle) rather than GroupStateTimeout;
drain-style runs (availableNow) leave TTL off, like the timeout=0
default of the sibling operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import OUTPUT_SCHEMA, STATE_CAP

_VALUE_SCHEMA = "max_turn int, seen array<int>, capped boolean"
_KEY_SCHEMA = "conv_id string"


def _check_turns(conv_id, turns, max_turn, seen, capped, out_rows):
    """Shared verdict kernel: mutates ``seen``/appends to
    ``out_rows``; returns (max_turn, seen, capped). Identical logic
    to stateful._validate_conv_impl (parity-pinned)."""
    for t in turns:
        t = int(t)
        if t in seen:
            out_rows.append((conv_id, t, "duplicate_turn", max_turn, capped))
        elif t < max_turn:
            out_rows.append((conv_id, t, "regressed_turn", max_turn, capped))
        max_turn = max(max_turn, t)
        seen.add(t)
        if len(seen) > STATE_CAP:
            seen = set(sorted(seen)[-STATE_CAP:])
            capped = True
    return max_turn, seen, capped


class ConvTurnProcessor(StatefulProcessor):
    """Grouping key = conv_id; one ValueState per conversation."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("conv", _VALUE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if self._state.exists():
            max_turn, seen_list, capped = self._state.get()
            seen = set(seen_list)
        else:
            max_turn, seen, capped = -1, set(), False
        out_rows: list = []
        for pdf in rows:
            max_turn, seen, capped = _check_turns(
                conv_id, pdf["turn_idx"].to_numpy(), max_turn, seen, capped, out_rows
            )
        self._state.update((max_turn, sorted(seen), capped))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "anomaly", "max_seen", "state_capped"],
            )

    def close(self) -> None:
        pass


# Micro-batches touching at least this FRACTION of the bucket's
# resident conversations bulk-read the whole MapState via iterator()
# (page-batched Arrow transfer) instead of one getValue RPC per
# conversation. Measured per-op costs on this box
# (scripts/tws_experiment.py, BENCH.md r5): point getValue 730–850 µs,
# updateValue 460–710 µs, bulk iterator 69–87 µs/entry — break-even at
# touched/resident ≈ 0.1. The default 0.2 is biased toward point
# reads because bulk cost scales with RESIDENT state (huge at the
# 10^12-turn steady state: ~10^5 convs/bucket, ~10 touched/batch →
# point reads); dense batches (backfill / replay / availableNow
# drains, touched ≈ resident) flip to bulk automatically.
DENSE_READ_FRACTION = 0.2


class BucketTurnProcessor(StatefulProcessor):
    """Grouping key = hash bucket; one MapState ENTRY per
    conversation — point reads/writes for touched convs only (the
    RocksDB-native layout; the packed-array bucket state of the
    applyInPandasWithState variant rewrites every conv per commit).

    Reads are adaptive: a batch touching ≥ ``dense_read_fraction`` ×
    the bucket's resident-conversation count pulls the whole map once
    via the page-batched iterator; sparser batches keep per-conv point
    reads. The resident count is tracked in a tiny companion
    ValueState (one extra point read+write per touched bucket per
    batch — ~1.2 ms, amortized over the batch's convs). Writes are
    always per-touched-conv — that asymmetry is the layout's contract
    (untouched conversations are never re-serialized)."""

    def __init__(self, dense_read_fraction: float = DENSE_READ_FRACTION) -> None:
        # instance attr (not the module global) so it pickles to the
        # Python workers with the processor
        self.dense_read_fraction = dense_read_fraction

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._convs = handle.getMapState("convs", _KEY_SCHEMA, _VALUE_SCHEMA)
        self._nres = handle.getValueState("n_resident", "n int")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        out_rows: list = []
        # materialize the group's pdfs (bounded: one bucket's share of
        # a micro-batch) so the touched-conv count is known before
        # choosing the read strategy
        pdfs = list(rows)
        touched = set()
        for pdf in pdfs:
            touched.update(pdf["conv_id"])
        n_resident = self._nres.get()[0] if self._nres.exists() else 0
        resident: dict | None = None
        if len(touched) >= self.dense_read_fraction * n_resident:
            resident = {k[0]: v for k, v in self._convs.iterator()}
            n_resident = len(resident)  # exact; heals any counter drift
        # batch-local cache: a conv touched by several pdfs reads
        # state once and writes once
        local: dict = {}
        n_new = 0
        for pdf in pdfs:
            for conv_id, sub in pdf.groupby("conv_id", sort=False):
                if conv_id in local:
                    max_turn, seen, capped = local[conv_id]
                else:
                    st = (
                        resident.get(conv_id)
                        if resident is not None
                        else self._convs.getValue((conv_id,))
                    )
                    if st is not None:
                        max_turn, seen, capped = st[0], set(st[1]), st[2]
                    else:
                        max_turn, seen, capped = -1, set(), False
                        n_new += 1
                local[conv_id] = _check_turns(
                    conv_id,
                    sub["turn_idx"].to_numpy(),
                    max_turn,
                    seen,
                    capped,
                    out_rows,
                )
        for conv_id, (max_turn, seen, capped) in local.items():
            self._convs.updateValue((conv_id,), (max_turn, sorted(seen), capped))
        self._nres.update((n_resident + n_new,))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "anomaly", "max_seen", "state_capped"],
            )

    def close(self) -> None:
        pass


_PACKED_SCHEMA = (
    "conv_ids array<string>, max_turns array<int>, "
    "seens array<array<int>>, caps array<boolean>"
)


class PackedBucketTurnProcessor(StatefulProcessor):
    """Bucket-keyed TWS variant with the applyInPandasWithState
    PACKED layout: one ValueState per bucket holding every conv as
    parallel arrays — 2 state RPCs per bucket per micro-batch instead
    of 2 per TOUCHED CONV. Exists to separate the transformWithState
    protocol cost from the state-layout cost (BENCH.md r4): point
    MapState entries win when resident state outgrows memory;
    packed wins while per-bucket state serializes cheaply."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("bucket", _PACKED_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            conv_ids, max_turns, seens, caps = self._state.get()
            st = {
                c: (m, set(s), cp)
                for c, m, s, cp in zip(conv_ids, max_turns, seens, caps)
            }
        else:
            st = {}
        out_rows: list = []
        for pdf in rows:
            for conv_id, sub in pdf.groupby("conv_id", sort=False):
                max_turn, seen, capped = st.get(conv_id, (-1, set(), False))
                st[conv_id] = _check_turns(
                    conv_id,
                    sub["turn_idx"].to_numpy(),
                    max_turn,
                    seen,
                    capped,
                    out_rows,
                )
        items = sorted(st.items())
        self._state.update(
            (
                [c for c, _ in items],
                [v[0] for _, v in items],
                [sorted(v[1]) for _, v in items],
                [v[2] for _, v in items],
            )
        )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "anomaly", "max_seen", "state_capped"],
            )

    def close(self) -> None:
        pass


def stateful_turn_checks_tws(
    stream_df: DataFrame,
    bucket_by: int = 0,
    layout: str = "map",
    dense_read_fraction: float = DENSE_READ_FRACTION,
) -> DataFrame:
    """transformWithState twin of
    :func:`satya_spark.streaming.stateful.stateful_turn_checks`.

    Requires the RocksDB state-store provider on the session::

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

    ``bucket_by > 0`` compacts the grouping key space into hash
    buckets (dispatch amortization); ``layout`` picks the bucket's
    state shape — ``"map"`` = one MapState entry per conversation
    (point writes; the state-outgrows-memory configuration) or
    ``"packed"`` = one ValueState of parallel arrays per bucket
    (2 RPCs/bucket/batch; wins while resident state is cheap to
    re-serialize — see BENCH.md r4). ``bucket_by = 0`` keys groups by
    conv_id directly with one ValueState each.
    ``dense_read_fraction`` tunes the map layout's adaptive read:
    batches touching at least that fraction of a bucket's resident
    conversations bulk-read the whole MapState instead of
    point-reading each (0.0 = always bulk; ``float('inf')`` = always
    point reads).
    """
    base = stream_df.select("conv_id", "turn_idx")
    if bucket_by > 0:
        from pyspark.sql import functions as F

        proc = (
            PackedBucketTurnProcessor()
            if layout == "packed"
            else BucketTurnProcessor(dense_read_fraction)
        )
        return (
            base.withColumn(
                "__bucket", F.pmod(F.xxhash64("conv_id"), F.lit(bucket_by))
            )
            .groupBy("__bucket")
            .transformWithStateInPandas(
                proc,
                outputStructType=OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )
    return base.groupBy("conv_id").transformWithStateInPandas(
        ConvTurnProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
