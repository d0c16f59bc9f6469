"""Training-mix operators (satya_spark/functions/mix.py): composition
rollup, deterministic stratified sampling, shard-local sequence
packing. DuckDB differentials run in the corpus_mix / mix_sample /
pack_sequences oracle gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from satya_spark.functions.mix import (
    corpus_mix,
    pack_sequences,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_corpus_mix_rollup(spark):
    df = _docs(
        spark,
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "en", "web"),
            (3, "sechs sieben acht neun zehn", "de", "web"),
        ],
    )
    out = {(r["lang"], r["source"]): r for r in corpus_mix(df).collect()}
    en = out[("en", "web")]
    assert en["n_docs"] == 2 and en["n_tokens"] == 5
    assert out[("de", "web")]["n_tokens"] == 5
    assert en["token_share"] == 0.5
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-6


def test_stratified_sample_deterministic(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3], "web")
            for i in range(3000)]
    df = _docs(spark, rows)
    fr = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in stratified_sample(df, fr, default=1.0).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, fr, default=1.0).collect()}
    assert a == b  # same seed → identical sample, run to run
    c = {r["doc_id"] for r in
         stratified_sample(df, fr, default=1.0, seed="other").collect()}
    assert a != c  # new seed → independent draw
    by_lang = {"en": 0, "de": 0, "fr": 0}
    for i in a:
        by_lang[["en", "de", "fr"][i % 3]] += 1
    assert by_lang["fr"] == 1000          # default 1.0 keeps everything
    assert 380 <= by_lang["en"] <= 620    # ~0.5 of 1000
    assert 40 <= by_lang["de"] <= 180     # ~0.1 of 1000
    # pure filter: no Exchange in the plan
    plan = (
        stratified_sample(df, fr)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "a b c", "en", "web"),          # 3 tokens
            (2, "d e", "en", "web"),            # 2 tokens
            (3, "f g h i", "en", "web"),        # 4 tokens
            (4, "", "en", "web"),               # empty doc
        ],
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(df, window_tokens=5, n_shards=1).collect()}
    # one shard, ordered by id: starts 0, 3, 5, 9
    assert [out[i]["start_tok"] for i in (1, 2, 3, 4)] == [0, 3, 5, 9]
    assert [out[i]["pack_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert out[4]["n_tokens"] == 0


def test_pack_sequences_shard_local(spark):
    rows = [(i, "w " * (i % 7 + 1), "en", "web") for i in range(200)]
    df = _docs(spark, rows)
    out = pack_sequences(df, window_tokens=16, n_shards=8).collect()
    shards = {r["shard"] for r in out}
    assert shards <= set(range(8)) and len(shards) > 1
    # within every shard the running offsets reconstruct exactly
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        expect = by_shard.get(r["shard"], 0)
        assert r["start_tok"] == expect
        assert r["pack_id"] == expect // 16
        by_shard[r["shard"]] = expect + r["n_tokens"]
