"""Training-mix operators: corpus composition rollups, deterministic
stratified sampling, and sequence packing — the planning/assembly half
of a training-data pipeline (hygiene lives in lines.py/gopher.py/
dedup.py; this module decides WHAT of the cleaned corpus ships to the
trainer and HOW it is laid out).

All three are engine-portable by construction (md5-derived hashes,
rounded doubles) so each has a DuckDB SQL twin for the differential
oracle.

100 TB plan shapes:

* :func:`corpus_mix` — ONE map-side-combining ``groupBy(strata)`` over
  a narrow projection (token count + quality are per-row codegen);
  the share-of-corpus column is a window over the ROLLUP (≤ thousands
  of strata rows), never over the corpus.
* :func:`stratified_sample` — a pure FILTER: keep iff
  ``hash64(seed‖id) mod 1e6 < frac·1e6``. No shuffle, no state, no
  sort; reproducible across runs/engines (the property `rand()`-based
  sampling loses the moment a partition is recomputed), and the
  per-stratum fraction is a broadcast when-chain of constants.
* :func:`pack_sequences` — concat-then-chunk packing (the standard LM
  pre-training layout): documents are ordered deterministically and
  split into fixed token windows; a doc's pack is the window its
  first token lands in. The running sum is a window function, so the
  corpus would serialize onto one task if packed globally — instead
  packing is SHARD-LOCAL: an md5-derived shard key with a
  configurable shard count bounds every sort to corpus/n_shards rows
  (trainers pack per-worker anyway; global order carries no signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash64, portable_hash64_sql
from .text import (
    quality_score,
    quality_score_sql,
    token_count_ws,
    token_count_ws_sql,
)

SAMPLE_DENOM = 1_000_000


def corpus_mix(
    df: DataFrame,
    strata: tuple = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum corpus composition: doc count, token count, mean
    quality score, and each stratum's share of corpus tokens.
    One narrow projection → one groupBy(strata); the share divides by
    a window-sum over the rollup rows only."""
    per = df.select(
        *strata,
        token_count_ws(F.col(text_col)).cast("long").alias("__tok"),
        quality_score(F.col(text_col)).alias("__q"),
    )
    agg = per.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.round(F.avg("__q"), 6).alias("mean_quality"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return agg.withColumn(
        "token_share",
        F.round(F.col("n_tokens").cast("double") / total, 6),
    )


def corpus_mix_sql(
    table: str,
    strata: tuple = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`corpus_mix`."""
    s = ", ".join(strata)
    return (
        f"SELECT {s}, n_docs, n_tokens, mean_quality,"
        " round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)"
        " AS token_share FROM ("
        f"SELECT {s}, CAST(count(*) AS BIGINT) AS n_docs,"
        f" CAST(sum({token_count_ws_sql(text_col)}) AS BIGINT) AS n_tokens,"
        f" round(avg({quality_score_sql(text_col)}), 6) AS mean_quality"
        f" FROM {table} GROUP BY {s})"
    )


def _sample_keep(
    id_col: str, stratum_col: str, fractions: dict, default: float, seed: str
) -> Column:
    h = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), seed), F.lit(SAMPLE_DENOM)
    )
    thr = F.lit(int(round(default * SAMPLE_DENOM)))
    for v, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == v, F.lit(int(round(frac * SAMPLE_DENOM)))
        ).otherwise(thr)
    return h < thr


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    default: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``md5-hash64(seed‖id) mod 1e6 < round(frac·1e6)``. ``fractions``
    maps stratum values to keep-fractions; unlisted strata use
    ``default``. Pure filter (no shuffle); changing ``seed`` draws an
    independent sample; the same (seed, id) decides identically on
    every run, engine, and partition layout."""
    return df.filter(
        _sample_keep(id_col, stratum_col, fractions, default, seed)
    )


def stratified_sample_sql(
    table: str,
    fractions: dict,
    default: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (SELECT *)."""
    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed)
    thr = str(int(round(default * SAMPLE_DENOM)))
    for v, frac in sorted(fractions.items()):
        thr = (
            f"CASE WHEN {stratum_col} = '{v}'"
            f" THEN {int(round(frac * SAMPLE_DENOM))} ELSE {thr} END"
        )
    return f"SELECT * FROM {table} WHERE {h} % {SAMPLE_DENOM} < ({thr})"


def pack_sequences(
    df: DataFrame,
    window_tokens: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> DataFrame:
    """Concat-then-chunk sequence packing, shard-local: rows are
    assigned a deterministic shard (md5-hash64 of the id), ordered by
    id within the shard, and packed greedily — ``start_tok`` is the
    running token offset and ``pack_id`` the ``window_tokens`` window
    the document STARTS in. Returns (id, shard, n_tokens, start_tok,
    pack_id).

    Each shard's window sort touches ~corpus/n_shards rows — size
    ``n_shards`` so a shard fits an executor (the default 1024 at
    10^9 docs ≈ 10^6 docs/shard); packing quality is unaffected
    because windows are filled greedily either way, only across-shard
    window ids differ. Empty docs pack as 0-token rows (they start in
    whatever window the running sum is in)."""
    toks = token_count_ws(F.col(text_col)).cast("long")
    shard = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), seed), F.lit(n_shards)
    ).cast("int")
    base = df.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.coalesce(
        F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)
    )
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        start.cast("long").alias("start_tok"),
        F.floor(start / F.lit(window_tokens)).cast("long").alias("pack_id"),
    )


def pack_sequences_sql(
    table: str,
    window_tokens: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed)
    return (
        f"SELECT {id_col}, shard, n_tokens,"
        " CAST(coalesce(sum(n_tokens) OVER w - n_tokens, 0) AS BIGINT)"
        " AS start_tok,"
        " CAST(floor(coalesce(sum(n_tokens) OVER w - n_tokens, 0)"
        f" / {window_tokens}.0) AS BIGINT) AS pack_id FROM ("
        f"SELECT {id_col}, CAST({h} % {n_shards} AS INT) AS shard,"
        f" CAST({token_count_ws_sql(text_col)} AS BIGINT) AS n_tokens"
        f" FROM {table})"
        f" WINDOW w AS (PARTITION BY shard ORDER BY {id_col})"
    )


def bernoulli_sample(
    df: DataFrame,
    p_col: str,
    id_col: str = "doc_id",
    seed: str = "bern",
) -> DataFrame:
    """Deterministic per-row Bernoulli keep with row-specific
    probability ``p_col`` (e.g. a classifier score mapped to [0, 1]):
    keep iff ``hash64(seed‖id) mod 1e6 < round(p·1e6)``. The
    weight-column generalization of :func:`stratified_sample` — same
    pure-filter shape (zero shuffle), same reproducibility across
    runs/engines/partition layouts; p ≤ 0 never keeps, p ≥ 1 always
    keeps."""
    h = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), seed), F.lit(SAMPLE_DENOM)
    )
    thr = F.round(
        F.greatest(F.least(F.col(p_col), F.lit(1.0)), F.lit(0.0))
        * SAMPLE_DENOM
    )
    return df.filter(h < thr)


def bernoulli_sample_sql(
    table: str, p_col: str, id_col: str = "doc_id", seed: str = "bern"
) -> str:
    """DuckDB twin of :func:`bernoulli_sample` (SELECT *)."""
    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed)
    return (
        f"SELECT * FROM {table} WHERE {h} % {SAMPLE_DENOM}"
        f" < round(greatest(least({p_col}, 1.0), 0.0) * {SAMPLE_DENOM})"
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    n: int = 100,
    id_col: str = "doc_id",
    seed: str = "cap",
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group document cap (the RefinedWeb-style per-domain cap):
    keep at most ``n`` documents per ``group_col`` value, chosen by a
    deterministic md5-hash priority over the id — so the survivors of
    an over-represented group are an unbiased, reproducible sample
    rather than "whatever sorted first", and re-running on any engine
    or partition layout keeps the same rows. Output: the input rows
    that survive, plus their in-group rank ``rk`` (1..n).

    Scale shape (100 TB design point): a single window over
    ``group_col`` funnels every row of a hot domain through ONE
    reduce task — web corpora are exactly the workload where one
    domain is 10^9 docs. Defused by the shared two-phase
    :func:`satya_spark.crossrow.salted_topn` (see its docstring for
    the losslessness argument).

    Full rows ride through phase 1's shuffle once; shuffling a narrow
    projection instead would need a join back (a second full shuffle)
    to recover the payload, so carrying the row is the cheaper plan.

    Plan (verified via explain, Spark 4): both rank filters compile to
    ``WindowGroupLimit`` nodes BELOW their Exchange — i.e. each map
    task pre-prunes to its local top-n per (group, salt) before
    shuffling — so phase 1 ships at most n × salt_buckets × maps rows
    and phase 2 at most n × salt_buckets per group.
    """
    from ..crossrow import salted_topn

    base = df.withColumn(
        "__pri", portable_hash64(F.col(id_col).cast("string"), seed)
    )
    return salted_topn(
        base,
        [group_col],
        [F.col("__pri"), F.col(id_col)],
        n,
        F.xxhash64(F.col(id_col).cast("string")),
        salt_buckets,
    ).drop("__pri")


def cap_per_group_sql(
    table: str,
    group_col: str = "source",
    n: int = 100,
    id_col: str = "doc_id",
    seed: str = "cap",
) -> str:
    """DuckDB twin of :func:`cap_per_group` (single window — the
    salted two-phase split is a physical rewrite with identical
    output, so the oracle states the logical form)."""
    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed)
    return (
        f"SELECT * EXCLUDE (__pri) FROM ("
        f"SELECT *, {h} AS __pri,"
        f" row_number() OVER (PARTITION BY {group_col}"
        f" ORDER BY {h}, {id_col}) AS rk"
        f" FROM {table}) WHERE rk <= {n}"
    )


def pack_segments(
    df: DataFrame,
    window_tokens: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> DataFrame:
    """The trainer-facing expansion of :func:`pack_sequences`: one row
    per (document, window) INTERSECTION — a document whose token run
    crosses window boundaries emits a segment row for every window it
    touches, with the token sub-range that lands there. Columns:
    (id, shard, pack_id, seg_start, seg_len) where seg_start is the
    offset INTO THE DOCUMENT (0-based) and Σ seg_len = n_tokens.
    Zero-token docs emit no segments.

    Same shard-local shape as pack_sequences plus one explode of
    sequence(first_window, last_window) — bounded by
    ceil(n_tokens / window) rows per doc."""
    packed = pack_sequences(
        df, window_tokens, n_shards, id_col, text_col, seed
    ).filter(F.col("n_tokens") > 0)
    w = F.lit(window_tokens)
    first = F.floor(F.col("start_tok") / w).cast("long")
    last = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / w).cast(
        "long"
    )
    e = packed.select(
        id_col,
        "shard",
        "start_tok",
        "n_tokens",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    seg_abs_start = F.greatest(F.col("start_tok"), F.col("pack_id") * w)
    seg_abs_end = F.least(
        F.col("start_tok") + F.col("n_tokens"), (F.col("pack_id") + 1) * w
    )
    return e.select(
        id_col,
        "shard",
        F.col("pack_id").cast("long").alias("pack_id"),
        (seg_abs_start - F.col("start_tok")).cast("long").alias("seg_start"),
        (seg_abs_end - seg_abs_start).cast("long").alias("seg_len"),
    )


def pack_segments_sql(
    table: str,
    window_tokens: int = 2048,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_segments`."""
    inner = pack_sequences_sql(
        table, window_tokens, n_shards, id_col, text_col, seed
    )
    wdw = f"{window_tokens}"
    return (
        f"SELECT {id_col}, shard, CAST(p AS BIGINT) AS pack_id,"
        f" CAST(greatest(start_tok, p * {wdw}) - start_tok AS BIGINT)"
        " AS seg_start,"
        f" CAST(least(start_tok + n_tokens, (p + 1) * {wdw})"
        f" - greatest(start_tok, p * {wdw}) AS BIGINT) AS seg_len"
        f" FROM (SELECT *, unnest(range(CAST(floor(start_tok / {wdw}.0) AS BIGINT),"
        f" CAST(floor((start_tok + n_tokens - 1) / {wdw}.0) AS BIGINT) + 1)) AS p"
        f" FROM ({inner}) WHERE n_tokens > 0)"
    )
