"""Text-analysis kernels over document/transcript text.

Everything here is a pure ``Column`` builder (JVM-side, codegen) with
a DuckDB-SQL twin for the differential oracle — same design as the
constraint compiler (satya_spark/compiler.py). No Python in the data
plane.

Kernels: whitespace + BPE-ish token counting, punctuation/stopword
ratios, a composite quality score, n-gram-heuristic language ID, and
md5 document fingerprinting (the deterministic, portable stand-in for
a rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[.,!?;:]"

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "nicht", "mit", "ich"),
    "fr": ("le", "la", "et", "est", "un", "une", "de", "que", "pas", "pour"),
    "es": ("el", "la", "es", "un", "una", "que", "de", "no", "por", "los"),
}
CJK_PATTERN = r"[一-鿿]"


def norm_text(col: Column) -> Column:
    """Whitespace-normalized lowercase text (dedup canonical form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def norm_text_sql(name: str) -> str:
    return f"trim(regexp_replace(lower({name}), '\\s+', ' ', 'g'))"


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens of the normalized text (empty text → [])."""
    return F.when(F.length(norm_text(col)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm_text(col), " ")
    )


def tokens_ws_sql(name: str) -> str:
    n = norm_text_sql(name)
    return (
        f"CASE WHEN length({n}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({n}, ' ') END"
    )


def token_count_ws(col: Column) -> Column:
    return F.size(tokens_ws(col))


def token_count_ws_sql(name: str) -> str:
    return f"len({tokens_ws_sql(name)})"


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: regex pre-tokenization match count."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def token_count_bpe_sql(name: str) -> str:
    return f"len(regexp_extract_all({name}, '{BPE_PATTERN}'))"


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(col)
    p = n - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(p.cast("double") / n, 6)
    )


def punct_ratio_sql(name: str) -> str:
    return (
        f"CASE WHEN length({name}) = 0 THEN 0.0 ELSE "
        f"round(CAST(length({name}) - length(regexp_replace({name}, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)"
        f" / length({name}), 6) END"
    )


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """# tokens that are stopwords of ``lang``.

    Implemented as a regexp count, NOT a higher-order ``F.filter``
    lambda: array lambdas are CodegenFallback and poison the entire
    enclosing projection into interpreted eval (~10× — measured,
    BENCH.md plan-shape rules), and ``lang_id`` evaluates this 4×.
    Token-exact counting via regex: every inter-token space of the
    normalized text is doubled, the whole string padded with one space
    each side, so every token is surrounded by its own spaces and
    ``' (w1|w2|…) '`` matches exactly the stopword tokens with no
    overlap (adjacent stopwords can't share a separator)."""
    words = STOPWORDS[lang]
    padded = F.concat(
        F.lit(" "), F.regexp_replace(norm_text(col), " ", "  "), F.lit(" ")
    )
    return F.regexp_count(padded, F.lit(" (" + "|".join(words) + ") "))


def stopword_hits_sql(name: str, lang: str = "en") -> str:
    words = "|".join(STOPWORDS[lang])
    n = norm_text_sql(name)
    return (
        f"len(regexp_extract_all(' ' || regexp_replace({n}, ' ', '  ', 'g')"
        f" || ' ', ' ({words}) '))"
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_ratio_from_hits(col, stopword_hits(col, lang))


def stopword_ratio_from_hits(col: Column, hits: Column) -> Column:
    """stopword_ratio over a PRE-PROJECTED hit count (attribute
    reference) — the structural-reuse form; see ``with_stopword_hits``."""
    n = token_count_ws(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(hits.cast("double") / n, 6)
    )


def stopword_ratio_sql(name: str, lang: str = "en") -> str:
    return (
        f"CASE WHEN {token_count_ws_sql(name)} = 0 THEN 0.0 ELSE "
        f"round(CAST({stopword_hits_sql(name, lang)} AS DOUBLE)"
        f" / {token_count_ws_sql(name)}, 6) END"
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    nonzero stopword signal. Deterministic arithmetic only."""
    return quality_score_from_hits(col, stopword_hits(col, "en"))


def quality_score_from_hits(col: Column, hits_en: Column) -> Column:
    """``quality_score`` with the English stopword hit count supplied
    as a pre-projected attribute reference (``with_stopword_hits``) —
    avoids re-deriving the padded-stopword regexp subtree inside the
    score expression."""
    n = F.length(col)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(
        stopword_ratio_from_hits(col, hits_en) > 0.02, F.lit(0.25)
    ).otherwise(F.lit(0.0))
    return F.when(F.coalesce(n, F.lit(0)) == 0, F.lit(0.0)).otherwise(
        F.round(len_ok + punct_ok + stop_ok, 2)
    )


def quality_score_sql(name: str) -> str:
    # CAST to DOUBLE: bare decimal literals make DuckDB produce
    # DECIMAL(_,2) ('1.00') where Spark produces DOUBLE ('1.0')
    return (
        f"CASE WHEN coalesce(length({name}), 0) = 0 THEN 0.0 ELSE "
        f"round(CAST((CASE WHEN length({name}) BETWEEN 50 AND 5000 THEN 0.5 ELSE 0.0 END)"
        f" + (CASE WHEN {punct_ratio_sql(name)} < 0.1 THEN 0.25 ELSE 0.0 END)"
        f" + (CASE WHEN {stopword_ratio_sql(name, 'en')} > 0.02 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) END"
    )


LANGS = ("en", "de", "fr", "es")


def with_stopword_hits(df, text_col: str = "text", prefix: str = "hits_"):
    """ONE projection hoisting the per-language stopword hit counts as
    attribute columns (``hits_en`` … ``hits_es``). This makes the
    no-duplicate-work property STRUCTURAL instead of resting on
    Catalyst common-subexpression elimination: downstream ``lang_id``
    / ``quality_score`` consume attribute references, so each
    language's padded-stopword regexp_count appears exactly once in
    the physical plan (pinned by tests/test_plans.py). CollapseProject
    will not inline a non-cheap expression referenced more than once,
    so the two-Project shape survives optimization."""
    c = F.col(text_col)
    return df.withColumns({f"{prefix}{l}": stopword_hits(c, l) for l in LANGS})


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK chars → zh, else argmax of
    per-language stopword hits (ties broken by fixed language order
    en>de>fr>es; no hits → 'und')."""
    return lang_id_from_hits(col, {l: stopword_hits(col, l) for l in LANGS})


def lang_id_from_hits(col: Column, hits: dict[str, Column]) -> Column:
    """``lang_id`` over pre-projected hit columns (attribute refs from
    ``with_stopword_hits``) — the structural-reuse form."""
    best = F.greatest(*hits.values())
    out = F.when(col.rlike(CJK_PATTERN), F.lit("zh")).when(best == 0, F.lit("und"))
    for l in LANGS:
        out = out.when(hits[l] == best, F.lit(l))
    return out


def lang_id_sql(name: str) -> str:
    h = {l: stopword_hits_sql(name, l) for l in ("en", "de", "fr", "es")}
    best = f"greatest({h['en']}, {h['de']}, {h['fr']}, {h['es']})"
    branches = "".join(
        f" WHEN {h[l]} = {best} THEN '{l}'" for l in ("en", "de", "fr", "es")
    )
    return (
        f"CASE WHEN regexp_matches({name}, '{CJK_PATTERN}') THEN 'zh'"
        f" WHEN {best} = 0 THEN 'und'{branches} END"
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    text (portable across engines, unlike xxhash64)."""
    return F.md5(norm_text(col))


def fingerprint_sql(name: str) -> str:
    return f"md5({norm_text_sql(name)})"


# --- repetition signals (Gopher-style quality rules) ------------------------

def with_repetition(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals for training-data filtering
    (the Gopher/MassiveText repetition rules re-expressed Spark-first):

    * ``n_tokens`` / ``n_distinct`` / ``ttr`` — type-token ratio
      (low TTR = heavy word repetition), computed per row in one
      codegen projection (``array_distinct`` is a regular expression,
      not a lambda HOF);
    * ``top_bigram_count`` / ``top_bigram_frac`` — the most frequent
      bigram's share of all bigrams, computed DISTRIBUTED: bigrams via
      ``arrays_zip`` of two shifted slices (no lambda HOF, stays in
      codegen) → explode → map-side-combining groupBy(doc, bigram) →
      per-doc max/sum → broadcast-friendly join back. Linear in corpus
      size; never the per-row O(tokens²) array-scan shape that a
      pure-expression version would force.

    Ties on the top bigram resolve identically everywhere because only
    the COUNT is reported, never an arbitrary winning bigram.
    """
    t = tokens_ws(F.col(text_col))
    per = df.select(F.col(id_col), t.alias("__t")).select(
        id_col,
        F.size("__t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_distinct"),
        "__t",
    )
    # greatest(...,0): slice length must be non-negative under ANSI
    # even for empty/1-token docs
    pairs = F.arrays_zip(
        F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
        F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
    )
    bg = per.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.concat_ws(" ", F.col("p")["0"], F.col("p")["1"]).alias("g")
    )
    top = (
        bg.groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(
            F.max("count").alias("top_bigram_count"),
            F.sum("count").alias("n_bigrams"),
        )
    )
    n = F.col("n_tokens")
    return per.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.when(n > 0, F.round(F.col("n_distinct").cast("double") / n, 6)).alias(
            "ttr"
        ),
        F.coalesce(F.col("top_bigram_count"), F.lit(0))
        .cast("long")
        .alias("top_bigram_count"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6
            ),
        ).alias("top_bigram_frac"),
    )


def repetition_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    standalone: bool = True,
) -> str:
    """DuckDB twin of :func:`with_repetition` (1-indexed lists).
    ``standalone=False`` emits a leading ``,`` so the CTEs chain onto
    an existing WITH clause (e.g. the docs fixture's)."""
    norm = norm_text_sql(text_col)
    return (
        ("WITH " if standalone else ", ")
        + f"__toks AS (SELECT {id_col}, "
        f"CASE WHEN length({norm}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({norm}, ' ') END AS t FROM {table}), "
        "__bg AS (SELECT "
        f"{id_col}, unnest(list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i+1])) AS g FROM __toks WHERE len(t) >= 2), "
        f"__cnt AS (SELECT {id_col}, g, count(*) AS c FROM __bg GROUP BY 1, 2), "
        f"__top AS (SELECT {id_col}, max(c) AS top_c, sum(c) AS n_bg"
        " FROM __cnt GROUP BY 1) "
        f"SELECT k.{id_col}, CAST(len(k.t) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(k.t)) AS BIGINT) AS n_distinct, "
        "CASE WHEN len(k.t) > 0 THEN"
        " round(CAST(len(list_distinct(k.t)) AS DOUBLE) / len(k.t), 6)"
        " END AS ttr, "
        "CAST(coalesce(p.top_c, 0) AS BIGINT) AS top_bigram_count, "
        "CASE WHEN p.n_bg > 0 THEN"
        " round(CAST(p.top_c AS DOUBLE) / p.n_bg, 6) END AS top_bigram_frac "
        f"FROM __toks k LEFT JOIN __top p USING ({id_col})"
    )
