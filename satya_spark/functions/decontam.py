"""Benchmark decontamination: word-n-gram overlap between a training
corpus and an evaluation suite.

The standard training-data hygiene step (GPT-3 appendix C / Gopher /
FLAN papers all use a variant): a training document is *contaminated*
if it shares enough word n-grams with any benchmark prompt, and must
be dropped before training. Re-expressed Spark-first:

* corpus side — distinct word-``n``-grams per document from ONE
  normalized-token projection (narrow; no shuffle to build).
* benchmark side — the distinct n-gram set of the whole eval suite.
  Eval suites are tiny next to a 100 TB corpus (thousands of prompts
  vs 10^11 documents), so this side is **broadcast**; the exploded
  corpus grams never shuffle for the probe.
* per-doc verdict — inner hash join corpus-grams ⨝ bench-grams, then
  ONE groupBy(doc_id) over the *hit* rows only (bounded by actual
  overlap, not corpus size). Output: (doc_id, n_grams, n_hit, share).

Grams are joined as md5-derived 63-bit ints (portable_hash64) so the
shuffled/broadcast key is 8 bytes, not a 50-char string, and so the
DuckDB oracle can compute byte-identical keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64, portable_hash64_sql
from .text import tokens_ws, tokens_ws_sql

DECONTAM_N = 8  # word n-gram width (GPT-3 used 13, Gopher 8)


def word_ngrams_from_tokens(toks: Column, n: int = DECONTAM_N) -> Column:
    """Array of space-joined word n-grams of a token-array column.

    Shape matters here: ``arrays_zip`` of ``n`` shifted slices, then a
    lambda that only touches the zipped struct fields. The naive form —
    ``transform(sequence(...), i -> array_join(slice(toks, i, n)))`` —
    inlines whatever expression ``toks`` is into the per-gram lambda,
    and Catalyst's projection collapse happily substitutes a full
    tokenization (regexp_replace + split) there, making gram-building
    O(grams × text_len): measured 6.8 s vs 0.8 s for a 5k-doc corpus
    (BENCH.md r4). With the zip form the token expression is evaluated
    at most n+1 times per ROW even under worst-case inlining, and the
    per-gram work is a concat_ws over bound struct fields.

    Texts shorter than ``n`` tokens map to [] (slices of length
    greatest(size-n+1, 0) are empty, so the zip is empty)."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, k, cnt).alias(f"t{k}") for k in range(1, n + 1)]
    )
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"t{k}"] for k in range(1, n + 1)])
    )
    # NULL text → NULL tokens would propagate; the contract (and the
    # DuckDB twin's CASE ... ELSE []) is an empty gram array
    return F.coalesce(grams, F.array().cast("array<string>"))


def word_ngram_hashes_from_tokens(toks: Column, n: int = DECONTAM_N) -> Column:
    """Array of 64-bit n-gram HASHES of a token-array column: same
    zip-of-shifted-slices shape as :func:`word_ngrams_from_tokens`,
    but each gram is keyed by ``xxhash64`` over its n token fields
    instead of materializing the space-joined string. Injective on
    gram tuples up to hash collision (tokens are whitespace-free, so
    tuple identity ⟺ string identity); distinct-counts over these
    hashes equal distinct-counts over the strings short of a
    collision. Used by the decontamination probe join."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, k, cnt).alias(f"t{k}") for k in range(1, n + 1)]
    )
    grams = F.transform(
        z, lambda s: F.xxhash64(*[s[f"t{k}"] for k in range(1, n + 1)])
    )
    return F.coalesce(grams, F.array().cast("array<bigint>"))


def word_ngrams(col: Column, n: int = DECONTAM_N) -> Column:
    """Word n-grams of the normalized text. Prefer projecting
    :func:`~satya_spark.functions.text.tokens_ws` to a real column and
    calling :func:`word_ngrams_from_tokens` on the attribute — this
    convenience form tokenizes up to n+1 times per row."""
    return word_ngrams_from_tokens(tokens_ws(col), n)


def word_ngrams_sql(name: str, n: int = DECONTAM_N) -> str:
    """DuckDB twin of :func:`word_ngrams` (list lambda + 1-based
    inclusive slices; range(1, 1) is already empty so no guard
    branch is needed, but we keep one for clarity/parity)."""
    t = tokens_ws_sql(name)
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n} + 2), "
        f"i -> array_to_string(list_slice({t}, i, i + {n - 1}), ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Per-document overlap with the benchmark suite: (doc_id,
    n_grams, n_hit, share) for every document sharing ≥1 distinct
    n-gram with any benchmark text. ``share`` = n_hit / n_grams
    rounded to 6 places (distinct-gram semantics on both sides).

    Plan shape: corpus explode is narrow, bench side is broadcast,
    the only Exchange is the final groupBy(doc_id) over hit rows.

    ``broadcast=True`` is right for real eval suites (10^4–10^6
    prompts → ≲100 MB of 8-byte keys). If the "benchmark" side is
    itself corpus-scale (e.g. decontaminating one training corpus
    against another), pass ``broadcast=False``: the probe becomes a
    shuffle hash join on the gram key and AQE picks the strategy.
    """
    # both sides key on xxhash64 OF THE TOKEN TUPLE (r6): a gram's
    # identity is its n tokens, and tokens contain no spaces, so the
    # space-joined string is injective on tuples — hashing the zipped
    # struct fields directly skips building every gram string AND the
    # md5→conv parse per gram (the md5-derived key was the dominant
    # corpus-side cost: 1.5 s of the 2.2 s query at sf0.1). Join
    # results differ from string-keyed only on an xxhash64 collision
    # between distinct grams (≲ V_corpus·V_bench/2⁶⁴ ≈ 1e-9 here);
    # the DuckDB oracle keeps its md5 twin — final report rows match.
    bench_grams = (
        bench.select(tokens_ws(F.col(bench_text_col)).alias("__toks"))
        .select(
            F.explode(
                F.array_distinct(
                    word_ngram_hashes_from_tokens(F.col("__toks"), n)
                )
            ).alias("__gh")
        )
        .distinct()
    )
    # materialize the per-doc gram-hash arrays before the explode:
    # projection collapse re-fuses the zip+transform gram pipeline
    # into the Generate through every logical barrier (even a
    # repartition), and a Generate evaluating that HOF chain inline
    # measured ~5× the cost of the array build itself (1.7 s vs
    # 0.3 s at sf0.1, r6). The checkpoint stores 8-byte hashes per
    # gram — about one token's width per token, i.e. one extra
    # corpus-width pass at scale, repaid by the explode+probe stage.
    doc_grams = docs.select(
        F.col(id_col), tokens_ws(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.array_distinct(
            word_ngram_hashes_from_tokens(F.col("__toks"), n)
        ).alias("__grams"),
    ).localCheckpoint()
    # explode WITHOUT a sibling size() projection: projection collapse
    # inlines the gram-building expression into the Generate, so a
    # `size(__grams)` column next to `explode(__grams)` evaluates the
    # whole zip+hash pipeline twice per row (measured r6: the explode
    # stage was 1.74 s vs 0.36 s for the array build alone at sf0.1).
    # n_grams is recovered for free as count() per doc — the array is
    # already distinct, so exploded-row count == size. The probe
    # becomes a LEFT join + hit flag; the groupBy is counts-only and
    # map-side combinable (one partial row per doc per partition), so
    # the 100 TB shape survives — the shuffle carries per-doc counts,
    # not gram strings.
    exploded = doc_grams.select(
        F.col(id_col), F.explode("__grams").alias("__gh")
    )
    probe = bench_grams.withColumn("__hit", F.lit(1))
    probe = F.broadcast(probe) if broadcast else probe
    j = exploded.join(probe, "__gh", "left")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        .select(
            F.col(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("share"),
        )
    )


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECONTAM_N,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop-list: ids of documents with ≥ ``min_hits`` overlapping
    n-grams (count-threshold semantics, the form the GPT-3/Gopher
    filters actually apply)."""
    rep = contamination_report(
        docs, bench, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    )
    return rep.filter(F.col("n_hit") >= min_hits).select(id_col)


def contamination_report_sql(
    docs_table: str,
    bench_table: str,
    n: int = DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`contamination_report` — same distinct
    semantics, same md5-derived join key, same rounding."""
    dg = word_ngrams_sql(text_col, n)
    bg = word_ngrams_sql(bench_text_col, n)
    gh = portable_hash64_sql("__g", "dc")
    return f"""
SELECT {id_col}, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_hit,
       round(CAST(count(*) AS DOUBLE) / n_grams, 6) AS share
FROM (
  SELECT {id_col}, len(grams) AS n_grams, unnest(grams) AS __g
  FROM (SELECT {id_col}, list_distinct({dg}) AS grams FROM {docs_table})
) e
WHERE {gh} IN (
  SELECT DISTINCT {portable_hash64_sql('__g', 'dc')}
  FROM (SELECT unnest(list_distinct({bg})) AS __g FROM {bench_table})
)
GROUP BY {id_col}, n_grams
"""
