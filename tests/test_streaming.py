"""Structured Streaming validation (SURVEY.md §2.7): micro-batch
kernel evaluation, foreachBatch verdict/violation sinks, event-time
windowed violation counts with watermark."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from satya_spark.spec import FieldSpec, TableSpec
from satya_spark.streaming.validate_stream import (
    annotate_stream,
    read_ndjson_stream,
    run_stream_to_sink,
    windowed_violation_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

SPEC = TableSpec(
    name="stream",
    fields=(
        FieldSpec("conv_id", "string", required=True),
        FieldSpec("turn_idx", "int", required=True, ge=0),
        FieldSpec("role", "string", required=True,
                  enum=("system", "user", "assistant", "tool")),
    ),
)


def _write_ndjson(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_validate_end_to_end(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    _write_ndjson(
        indir / "batch1.ndjson",
        [
            {"conv_id": "c1", "turn_idx": 0, "role": "system", "ts": "2024-01-01T00:00:00Z"},
            {"conv_id": "c1", "turn_idx": 1, "role": "moderator", "ts": "2024-01-01T00:00:30Z"},
            {"conv_id": "c2", "turn_idx": -1, "role": "user", "ts": "2024-01-01T00:01:10Z"},
        ],
    )
    stream = read_ndjson_stream(spark, str(indir), SCHEMA)
    assert stream.isStreaming
    ann = annotate_stream(stream, SPEC)
    q = run_stream_to_sink(
        ann,
        verdict_path=str(tmp_path / "verdicts"),
        violations_path=str(tmp_path / "violations"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    verd = spark.read.parquet(str(tmp_path / "verdicts")).collect()
    assert sum(r["n_rows"] for r in verd) == 3
    assert sum(r["n_invalid"] for r in verd) == 2
    viol = spark.read.parquet(str(tmp_path / "violations")).collect()
    got = {(r["field"], r["constraint_name"]) for r in viol}
    assert got == {("role", "enum"), ("turn_idx", "ge")}

    # resume: same checkpoint, new file -> only the new rows processed
    _write_ndjson(
        indir / "batch2.ndjson",
        [{"conv_id": "c3", "turn_idx": 0, "role": "user", "ts": "2024-01-01T00:02:00Z"}],
    )
    stream2 = read_ndjson_stream(spark, str(indir), SCHEMA)
    q2 = run_stream_to_sink(
        annotate_stream(stream2, SPEC),
        verdict_path=str(tmp_path / "verdicts"),
        violations_path=str(tmp_path / "violations"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    verd2 = spark.read.parquet(str(tmp_path / "verdicts")).collect()
    assert sum(r["n_rows"] for r in verd2) == 4  # 3 + 1, not 6


def test_windowed_violation_counts(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    _write_ndjson(
        indir / "b.ndjson",
        [
            {"conv_id": "c1", "turn_idx": 0, "role": "system", "ts": "2024-01-01T00:00:10Z"},
            {"conv_id": "c1", "turn_idx": 1, "role": "bad", "ts": "2024-01-01T00:00:20Z"},
            {"conv_id": "c1", "turn_idx": 2, "role": "user", "ts": "2024-01-01T00:01:40Z"},
        ],
    )
    stream = read_ndjson_stream(spark, str(indir), SCHEMA)
    # short watermark so the final event (00:01:40) closes the first
    # window — append mode only emits watermark-closed windows
    win = windowed_violation_counts(
        annotate_stream(stream, SPEC), "ts", "1 minute", watermark="10 seconds"
    )
    q = (
        win.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "win"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes the first window
    rows = spark.read.parquet(str(tmp_path / "win")).collect()
    by_start = {str(r["window_start"]): (r["n_rows"], r["n_invalid"]) for r in rows}
    assert by_start.get("2024-01-01 00:00:00") == (2, 1)


def test_windowed_histograms_and_psi(spark, tmp_path):
    """Streaming drift tier: event-time windowed fixed-grid
    histograms (watermark-bounded state), then per-window PSI against
    a static reference — window 1 matches the reference (psi ~ 0),
    window 2 is shifted (psi high)."""
    from satya_spark.streaming.validate_stream import (
        window_psi_vs_reference,
        windowed_value_histograms,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    # window 1 (00:00–00:01): values spread 0..199 → buckets 0..3
    # window 2 (00:01–00:02): values 800+ → bucket 16+
    rows = []
    for i in range(40):
        rows.append(
            {"conv_id": f"c{i}", "turn_idx": i * 5, "role": "user",
             "ts": f"2024-01-01T00:00:{i % 60:02d}Z"}
        )
    for i in range(40):
        rows.append(
            {"conv_id": f"d{i}", "turn_idx": 800 + i, "role": "user",
             "ts": f"2024-01-01T00:01:{i % 60:02d}Z"}
        )
    # closer event: pushes the watermark past both windows
    rows.append({"conv_id": "zz", "turn_idx": 0, "role": "user",
                 "ts": "2024-01-01T00:10:00Z"})
    _write_ndjson(indir / "b.ndjson", rows)

    stream = read_ndjson_stream(spark, str(indir), SCHEMA)
    hists = windowed_value_histograms(
        stream, "turn_idx", "ts", window="1 minute",
        watermark="10 seconds", width=50.0, n_buckets=20,
    )
    q = (
        hists.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "h"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = spark.read.parquet(str(tmp_path / "h"))
    # reference = uniform over buckets 0..3 (what window 1 looks like)
    ref = [10, 10, 10, 10] + [0] * 16
    psi = {
        str(r["window_start"]): r["psi"]
        for r in window_psi_vs_reference(batch, ref, n_buckets=20).collect()
    }
    assert psi["2024-01-01 00:00:00"] < 0.05
    assert psi["2024-01-01 00:01:00"] > 1.0


def test_run_stream_split_quarantine(spark, tmp_path):
    """Streaming quarantine: valid rows land under valid=true, invalid
    rows (violations attached) under valid=false — the same layout as
    the batch write_split, readable via io.read_split, exactly-once
    across a checkpointed restart with a new input file."""
    from satya_spark.io import read_split
    from satya_spark.streaming.validate_stream import run_stream_split

    indir = tmp_path / "in"
    indir.mkdir()
    _write_ndjson(
        indir / "b1.ndjson",
        [
            {"conv_id": "c1", "turn_idx": 0, "role": "system", "ts": "2024-01-01T00:00:00Z"},
            {"conv_id": "c1", "turn_idx": 1, "role": "moderator", "ts": "2024-01-01T00:00:30Z"},
            {"conv_id": "c2", "turn_idx": -1, "role": "user", "ts": "2024-01-01T00:01:10Z"},
        ],
    )
    out = str(tmp_path / "split")
    ck = str(tmp_path / "ckpt")
    ann = annotate_stream(read_ndjson_stream(spark, str(indir), SCHEMA), SPEC)
    run_stream_split(ann, out, ck).awaitTermination(120)

    clean = read_split(spark, out, "clean")
    quar = read_split(spark, out, "quarantine")
    assert clean.count() == 1
    assert {r["conv_id"] for r in clean.collect()} == {"c1"}
    rows = quar.collect()
    assert len(rows) == 2
    got = {
        (v["field"], v["constraint_name"]) for r in rows for v in r["violations"]
    }
    assert got == {("role", "enum"), ("turn_idx", "ge")}

    # restart from the same checkpoint with one new file: only the new
    # row is appended (file-sink log keeps the split exactly-once)
    _write_ndjson(
        indir / "b2.ndjson",
        [{"conv_id": "c3", "turn_idx": 0, "role": "user", "ts": "2024-01-01T00:02:00Z"}],
    )
    ann2 = annotate_stream(read_ndjson_stream(spark, str(indir), SCHEMA), SPEC)
    run_stream_split(ann2, out, ck).awaitTermination(120)
    assert read_split(spark, out, "clean").count() == 2
    assert read_split(spark, out, "quarantine").count() == 2


def test_stream_hygiene_doc_local_ops(spark, tmp_path):
    """The doc-local hygiene battery (C4 clean_lines, gopher_quality,
    classifier_score-with-broadcast) is ZERO-shuffle by construction,
    so it composes directly with readStream — clean-on-ingest without
    a batch re-pass. Streams a parquet doc feed through all three and
    checks the sink against the batch run of the same input."""
    from satya_spark.functions.classify import classifier_score
    from satya_spark.functions.gopher import gopher_quality
    from satya_spark.functions.lines import clean_lines

    indir = str(tmp_path / "docs_in")
    good = "\n".join([
        "the quick brown fox jumps over the lazy dog near that barn.",
        "a farmer went out early to check on those wide green fields.",
        "later that evening everyone gathered around with warm bread.",
        "children played outside until the stars came up above town.",
        "nobody wanted to leave because the music kept playing on it.",
    ])
    rows = [
        (1, good),
        (2, "lorem ipsum dolor sit amet."),   # C4 page poison
        (3, good + "\nclick here"),            # junk line filtered
    ]
    batch_df = spark.createDataFrame(rows, "doc_id long, text string")
    batch_df.write.parquet(indir)

    stream = spark.readStream.schema("doc_id long, text string").parquet(indir)
    assert stream.isStreaming
    cleaned = clean_lines(stream)            # narrow: streams as-is
    quality = gopher_quality(stream)         # narrow: streams as-is
    out_c = str(tmp_path / "cleaned")
    out_q = str(tmp_path / "quality")
    for df, path, name in ((cleaned, out_c, "c"), (quality, out_q, "q")):
        (
            df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    got_c = {r["doc_id"]: r["text_clean"]
             for r in spark.read.parquet(out_c).collect()}
    want_c = {r["doc_id"]: r["text_clean"]
              for r in clean_lines(batch_df).collect()}
    assert got_c == want_c and set(got_c) == {1, 3}
    got_q = {r["doc_id"]: r["gopher_keep"]
             for r in spark.read.parquet(out_q).collect()}
    assert got_q == {r["doc_id"]: r["gopher_keep"]
                     for r in gopher_quality(batch_df).collect()}

    # classifier: the per-doc groupBy makes it a streaming aggregation
    # (append mode rejects it without a watermark), so the streaming
    # form is foreachBatch — score each micro-batch as a batch frame
    # against the broadcast model, the standard clean-on-ingest shape
    w = spark.createDataFrame(
        [("fox", 5.0), ("lorem", -5.0)], "token string, weight double"
    )
    out_s = str(tmp_path / "scored")
    (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: classifier_score(bdf, w)
            .write.mode("append")
            .parquet(out_s)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got_s = {r["doc_id"]: r["logit"]
             for r in spark.read.parquet(out_s).collect()}
    assert got_s == {r["doc_id"]: r["logit"]
                     for r in classifier_score(batch_df, w).collect()}
