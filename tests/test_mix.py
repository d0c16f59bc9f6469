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


def test_bernoulli_sample_extremes_and_determinism(spark):
    from satya_spark.functions.mix import bernoulli_sample

    rows = [(i, f"t {i}", "en", "web", p)
            for i, p in enumerate([0.0, 1.0, 0.5, -3.0, 7.0] * 200)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, p double"
    )
    kept = {r["doc_id"] for r in bernoulli_sample(df, "p").collect()}
    for i in range(0, 1000, 5):
        assert i not in kept          # p = 0.0 never keeps
        assert i + 1 in kept          # p = 1.0 always keeps
        assert i + 3 not in kept      # p clamps below at 0
        assert i + 4 in kept          # p clamps above at 1
    mid = [i for i in kept if i % 5 == 2]
    assert 60 <= len(mid) <= 140      # ~0.5 of 200
    assert kept == {r["doc_id"] for r in bernoulli_sample(df, "p").collect()}


def test_pack_segments_reconstruct(spark):
    from satya_spark.functions.mix import pack_segments, pack_sequences

    rows = [(i, "w " * (3 + i % 11), "en", "web") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    seqs = {r["doc_id"]: r for r in
            pack_sequences(df, window_tokens=7, n_shards=4).collect()}
    segs = pack_segments(df, window_tokens=7, n_shards=4).collect()
    by_doc: dict = {}
    for s in segs:
        by_doc.setdefault(s["doc_id"], []).append(s)
    for i, r in seqs.items():
        parts = sorted(by_doc.get(i, []), key=lambda s: s["pack_id"])
        assert sum(p["seg_len"] for p in parts) == r["n_tokens"]
        assert parts[0]["pack_id"] == r["pack_id"]  # first window = start window
        assert parts[0]["seg_start"] == 0
        # consecutive windows, contiguous in-document ranges
        off = 0
        for j, p in enumerate(parts):
            assert p["pack_id"] == parts[0]["pack_id"] + j
            assert p["seg_start"] == off and p["seg_len"] >= 1
            off += p["seg_len"]
        # every middle segment fills a whole window
        for p in parts[1:-1]:
            assert p["seg_len"] == 7


def test_cap_per_group_semantics(spark):
    from satya_spark.functions.mix import cap_per_group

    rows = [
        (i, f"text {i}", "en", "hot" if i < 40 else f"src{i % 5}")
        for i in range(60)
    ]
    df = _docs(spark, rows)
    out = cap_per_group(df, group_col="source", n=7, salt_buckets=4).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # hot group (40 docs) capped at 7; small groups (4 docs each) untouched
    assert len(by_src["hot"]) == 7
    for s, grp in by_src.items():
        if s != "hot":
            assert len(grp) == 4
        assert sorted(r["rk"] for r in grp) == list(range(1, len(grp) + 1))
    # payload columns survive the cap
    assert all(r["text"] == f"text {r['doc_id']}" for r in out)
    # deterministic: same seed → same survivors regardless of salt_buckets
    again = {
        r["doc_id"]
        for r in cap_per_group(
            df, group_col="source", n=7, salt_buckets=16
        ).collect()
    }
    assert again == {r["doc_id"] for r in out}
    # a different seed draws a different survivor set for the hot group
    other = {
        r["doc_id"]
        for r in cap_per_group(
            df, group_col="source", n=7, seed="cap2"
        ).collect()
        if r["source"] == "hot"
    }
    assert other != {r["doc_id"] for r in by_src["hot"]}
