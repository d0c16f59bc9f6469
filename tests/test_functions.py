"""Training-data pipeline operators: text analytics, dedup family,
similarity search, multimodal plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from satya_spark.functions import text as tx
from satya_spark.functions import dedup
from satya_spark.functions import similarity as sim
from satya_spark.functions import multimodal as mm


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


# --- text ------------------------------------------------------------------

def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("  spaced   out  ",), ("",), ("ab12 c!",)], ["t"]
    )
    out = df.select(
        tx.token_count_ws(F.col("t")).alias("ws"),
        tx.token_count_bpe(F.col("t")).alias("bpe"),
    ).collect()
    assert [r["ws"] for r in out] == [3, 2, 0, 2]
    # bpe: [ab][12] [c][!] -> 4 ; hello/world/foo -> 3
    assert out[0]["bpe"] == 3 and out[3]["bpe"] == 4


def test_punct_and_quality(spark):
    long_clean = "the cat sat on the mat and it is a fine day for all of us " * 3
    punchy = "a!!!, ..;;::!!" + "x" * 40
    df = spark.createDataFrame([(long_clean,), (punchy,), ("",)], ["t"])
    rows = df.select(
        tx.punct_ratio(F.col("t")).alias("p"),
        tx.quality_score(F.col("t")).alias("q"),
    ).collect()
    assert rows[0]["p"] == 0.0 and rows[0]["q"] == 1.0
    assert rows[1]["p"] > 0.1 and rows[1]["q"] <= 0.5
    assert rows[2]["p"] == 0.0 and rows[2]["q"] == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is fine",),
            ("der hund ist nicht mit der katze und ich",),
            ("le chat est une belle bête pour la maison",),
            ("你好世界 这是中文",),
            ("qwzx gleeb norp",),
        ],
        ["t"],
    )
    preds = [r[0] for r in df.select(tx.lang_id(F.col("t"))).collect()]
    assert preds == ["en", "de", "fr", "zh", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello   World",), ("hello world",)], ["t"])
    fps = [r[0] for r in df.select(tx.fingerprint(F.col("t"))).collect()]
    assert fps[0] == fps[1]
    assert fps[0] == hashlib.md5(b"hello world").hexdigest()


# --- dedup -------------------------------------------------------------------

def test_exact_dup_groups(spark):
    df = _docs(
        spark,
        [(1, "a b c", "en"), (2, "A  b C", "en"), (3, "unique text", "en")],
    )
    out = dedup.exact_dup_groups(df).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["canonical_id"] == 1


def test_jaccard_pairs(spark):
    df = _docs(
        spark,
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en"),
            (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz", "en"),  # jac 9/11
            (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "en"),
            (4, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "fr"),  # other block
        ],
    )
    pairs = {(r["id_a"], r["id_b"]): r["jac"] for r in dedup.jaccard_pairs(df, 0.6).collect()}
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - round(9 / 11, 6)) < 1e-9
    assert (1, 3) not in pairs
    assert all(a != 4 and b != 4 for a, b in pairs)  # lang-blocked


def _py_minhash(tokens, i):
    return min(
        int(hashlib.md5(f"mh{i}:{t}".encode()).hexdigest()[:15], 16) for t in tokens
    )


def test_minhash_matches_ground_truth(spark):
    # regression for the F.transform 2-arg lambda trap: the seed must
    # actually be the seed, not the array index
    toks = ["alpha", "beta", "gamma", "delta"]
    df = _docs(spark, [(1, " ".join(toks), "en")])
    row = dedup.minhash_signatures(df).collect()[0]
    for i in range(dedup.MINHASH_K):
        assert row[f"mh{i}"] == _py_minhash(toks, i), f"mh{i}"


def test_minhash_dedup_finds_near_dups(spark):
    base = " ".join(f"tok{i}" for i in range(30))
    df = _docs(
        spark,
        [(1, base, "en"), (2, base + " extra", "en"), (3, "совсем other words", "en")],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(df, 0.6).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def _py_simhash(tokens):
    sums = [0] * dedup.SIMHASH_BITS
    for t in set(tokens):
        h = int(hashlib.md5(f"sh:{t}".encode()).hexdigest()[:15], 16)
        for b in range(dedup.SIMHASH_BITS):
            sums[b] += 1 if (h >> b) & 1 else -1
    return sum((1 if s >= 0 else 0) << b for b, s in enumerate(sums))


def test_simhash_matches_ground_truth(spark):
    toks = ["red", "green", "blue", "cyan", "magenta"]
    df = _docs(spark, [(1, " ".join(toks), "en")])
    row = dedup.simhash_signatures(df).collect()[0]
    assert row["simhash"] == _py_simhash(toks)


def test_simhash_pairs_near_dups(spark):
    base = " ".join(f"w{i}" for i in range(40))
    df = _docs(
        spark,
        [(1, base, "en"), (2, base + " tail", "en"), (3, "x y z q r s", "en")],
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(df, 4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4


# --- similarity ---------------------------------------------------------------

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk(spark):
    corpus = _emb(spark, [[1, 0], [0.9, 0.1], [0, 1], [1, 0.05]])
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.brute_force_topk(corpus, queries, k=2).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(1, 3), (2, 1)]
    assert all(0 <= r["cos_sim"] <= 1 for r in out)


def test_lsh_topk_recall(spark):
    import math

    vecs = []
    for i in range(60):
        vecs.append([math.sin(i * 0.37 + d) for d in range(8)])
    corpus = _emb(spark, vecs)
    queries = corpus.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.brute_force_topk(corpus, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in sim.lsh_topk(corpus, queries, k=3, n_planes=2, dims=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # deterministic given fixed planes


def test_embedding_near_dup_pairs(spark):
    corpus = _emb(
        spark,
        [[1, 0, 0], [0.999, 0.001, 0], [0, 1, 0], [0, 0, 1]],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             sim.embedding_near_dup_pairs(corpus, threshold=0.99, n_planes=4, dims=3).collect()}
    assert (0, 1) in pairs and len(pairs) == 1


def test_ivf_topk_recall(spark):
    import math

    vecs = [[math.sin(i * 0.37 + d) for d in range(8)] for i in range(80)]
    corpus = _emb(spark, vecs)
    cents = sim.train_centroids(corpus, k=4, iters=2)
    assert len(cents) == 4 and len(cents[0]) == 8
    queries = corpus.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.brute_force_topk(corpus, queries, k=3).collect()
    }
    # full probe (nprobe=k) must recover brute force exactly
    full = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_topk(corpus, queries, cents, k=3, nprobe=4).collect()
    }
    assert full == exact
    # partial probe trades recall for scan fraction
    part = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_topk(corpus, queries, cents, k=3, nprobe=2).collect()
    }
    assert len(exact & part) / len(exact) >= 0.5


# --- multimodal -----------------------------------------------------------------

def test_media_features_plumbing(spark):
    media = mm.synthesize_media(spark, 30)
    feats = mm.extract_features(media, dim=4)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 4 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, dim=4).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_frame_sample_plan(spark):
    media = mm.synthesize_media(spark, 30)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows and all(r["ts_ms"] % 1000 == 0 for r in rows)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"xx")
