"""Quality-classifier application: score every document with a linear
bag-of-words model (the fastText-style quality filter used by GPT-3 /
CCNet-descended pipelines — classify documents against a trained
unigram model and keep high scorers). The model here is an INPUT — a
(token, weight) table — because training happens offline; what a
100 TB engine owes is the APPLICATION shape:

* the weight table is a few-million-row dimension → **broadcast hash
  join** against the exploded corpus tokens (never a shuffle of the
  corpus side);
* the per-doc reduction is a map-side-combining ``groupBy(id)`` —
  the shuffle carries one partial (sum, count) per doc per partition,
  not token rows;
* the reported score is the ROUNDED MEAN LOGIT, not a sigmoid:
  sigmoid is monotone (decisions are identical on the logit) and
  ``exp`` differs in final ulps across engines, which would poison
  the differential oracle for zero analytical value.

:func:`hash_weights` supplies a deterministic stand-in model (md5-
derived weights in [-1, 1]) so the pipeline is testable end-to-end
without shipping a trained artifact — swap in real weights by passing
any (token, weight) DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64, portable_hash64_sql
from .text import tokens_ws, tokens_ws_sql

WEIGHT_DENOM = 1000


def hash_weights(
    df: DataFrame,
    text_col: str = "text",
    seed: str = "clf",
) -> DataFrame:
    """Deterministic (token, weight) table over the corpus vocabulary:
    weight = md5-hash64(seed‖token) mod 2001 − 1000 ∈ [−1000, 1000],
    INTEGRAL by design — sums of integral doubles below 2⁵³ are exact
    in any addition order, so the differential oracle can't be flipped
    by summation-order ulps (a real fractional model still works:
    the 6-decimal rounding absorbs last-ulp noise, this stand-in just
    removes even that). Same cardinality/shape as a trained unigram
    model."""
    tok = df.select(
        F.explode(tokens_ws(F.col(text_col))).alias("token")
    ).distinct()
    w = F.pmod(
        portable_hash64(F.col("token"), seed),
        F.lit(2 * WEIGHT_DENOM + 1),
    ) - F.lit(WEIGHT_DENOM)
    return tok.select("token", w.cast("double").alias("weight"))


def hash_weights_sql(table: str, text_col: str = "text", seed: str = "clf") -> str:
    h = portable_hash64_sql("token", seed)
    return (
        "SELECT token,"
        f" CAST({h} % {2 * WEIGHT_DENOM + 1} - {WEIGHT_DENOM} AS DOUBLE)"
        " AS weight FROM ("
        f"SELECT DISTINCT unnest({tokens_ws_sql(text_col)}) AS token"
        f" FROM {table})"
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Apply a linear bag-of-words classifier: logit = bias + mean
    token weight (tokens absent from the model contribute 0 — the
    LEFT join keeps the token count honest). Returns (id, n_tokens,
    logit, clf_keep) with logit rounded to 6 decimals and
    ``clf_keep = logit > threshold``. Empty docs score bias alone.

    ``broadcast=True`` is right for real models (10⁵–10⁷ tokens —
    megabytes of weights); pass False only if the "model" is itself
    corpus-scale, which turns the probe into a shuffle-shuffle join.
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens_ws(F.col(text_col))).alias("token")
    )
    w = F.broadcast(weights) if broadcast else weights
    scored = (
        toks.join(w, "token", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__s"),
            F.count(F.col("token")).alias("n_tokens"),
        )
    )
    n = F.col("n_tokens")
    logit = F.round(
        F.lit(float(bias))
        + F.when(n > 0, F.col("__s") / n).otherwise(F.lit(0.0)),
        6,
    )
    return scored.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        logit.alias("logit"),
        (logit > F.lit(float(threshold))).alias("clf_keep"),
    )


def classifier_score_sql(
    table: str,
    weights_table: str,
    bias: float = 0.0,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`classifier_score` (unnest may drop empty
    lists, so empty docs are restored by the left join to the base
    table, scoring bias alone with n_tokens 0)."""
    return (
        f"SELECT b.{id_col}, CAST(coalesce(s.n_tokens, 0) AS BIGINT)"
        " AS n_tokens,"
        f" round({float(bias)} + CASE WHEN coalesce(s.n_tokens, 0) > 0"
        " THEN s.__s / s.n_tokens ELSE 0.0 END, 6) AS logit,"
        f" round({float(bias)} + CASE WHEN coalesce(s.n_tokens, 0) > 0"
        " THEN s.__s / s.n_tokens ELSE 0.0 END, 6)"
        f" > {float(threshold)} AS clf_keep"
        f" FROM {table} b LEFT JOIN ("
        f"SELECT t.{id_col}, sum(coalesce(w.weight, 0.0)) AS __s,"
        " count(*) AS n_tokens FROM ("
        f"SELECT {id_col}, unnest({tokens_ws_sql(text_col)}) AS token"
        f" FROM {table}) t LEFT JOIN {weights_table} w USING (token)"
        f" GROUP BY t.{id_col}) s USING ({id_col})"
    )
