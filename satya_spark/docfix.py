"""Document fixture: the driver's ``documents`` table plus planted
exact and near duplicates (deterministic modulus sites), identical in
Spark SQL and DuckDB — the documents analog of transcripts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_CTE = """
docs AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 97 = 0          -- exact dups
  UNION ALL
  SELECT doc_id + 200000, concat(text, ' zz'), lang, source, n_chars
  FROM documents WHERE doc_id % 89 = 0          -- near dups (one extra token)
)
"""


def docs_with_clause() -> str:
    return "WITH " + DOCS_CTE


def docs_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents fixture + planted dups. Repartitioned to the
    session's default parallelism: the testdata parquet is a single
    small file that Spark reads as ≤3 splits, which would cap every
    CPU-heavy downstream stage (per-token md5 in minhash, gram
    explodes) at 3 of 32 cores. At production scale the corpus
    arrives in thousands of splits and this exchange is a no-op
    decision — the row set (and every oracle result) is unchanged."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    df = spark.sql(docs_with_clause() + " SELECT * FROM docs")
    return df.repartition(spark.sparkContext.defaultParallelism)


EMB_CTE = """
embfix AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding
  FROM embeddings WHERE vec_id % 53 = 0          -- exact-dup vectors
)
"""


def emb_with_clause() -> str:
    return "WITH " + EMB_CTE


def emb_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings + planted exact-duplicate vectors (deterministic
    modulus sites), identical in Spark SQL and DuckDB — makes the
    near-dup gate non-vacuous."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(emb_with_clause() + " SELECT * FROM embfix")


PII_CTE = """
pii_docs AS (
  SELECT doc_id,
    concat(text,
      CASE WHEN doc_id % 7 = 0
           THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com')
           ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END,
      CASE WHEN doc_id % 13 = 0
           THEN ' call 555.123.4567 or 555-123-4567' ELSE '' END,
      CASE WHEN doc_id % 17 = 0
           THEN concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.1')
           ELSE '' END) AS text
  FROM documents
)
"""


def pii_with_clause() -> str:
    return "WITH " + PII_CTE


def pii_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministically planted PII (modulus sites per
    category, coinciding on doc_id multiples of several moduli so
    multi-category rows exist) — identical in Spark SQL and DuckDB;
    the raw corpus contains no PII, so the gate would otherwise be
    vacuous."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    df = spark.sql(pii_with_clause() + " SELECT * FROM pii_docs")
    # same small-file split-cap mitigation as docs_from_testdata: the
    # PII regex battery is CPU-bound and would otherwise run on ≤3 cores
    return df.repartition(spark.sparkContext.defaultParallelism)


def lines_cte(dialect: str = "duckdb") -> str:
    """Multi-line document fixture for the line-hygiene gates
    (functions/lines.py): the base documents table has single-line
    texts, so this derives a deterministic multi-line text per doc —
    two content lines from the doc's own tokens (terminal-punctuated,
    ≥5 words), a within-doc duplicate of line 1 on doc_id%4, a short
    line ('click here') on %3, a 'javascript' line on %5, a
    'lorem ipsum' page-poison line on %7, a curly-brace page-poison
    line on %11, and a corpus-wide duplicate footer on every doc.
    NULL branches vanish via concat_ws's NULL-skipping (identical in
    Spark and DuckDB). DuckDB dialect only — the Spark side is
    :func:`lines_docs_from_testdata` (DataFrame API)."""
    if dialect != "duckdb":
        raise ValueError("lines_cte is the DuckDB oracle side only")
    from .functions.text import tokens_ws_sql

    t = tokens_ws_sql("text")
    l1 = f"array_to_string(list_slice({t}, 1, 8), ' ') || ' alpha beta gamma delta.'"
    l4 = f"array_to_string(list_slice({t}, 9, 14), ' ') || ' epsilon zeta eta theta?'"
    return (
        "lines_docs AS (\n"
        "  SELECT doc_id, concat_ws(chr(10),\n"
        f"    {l1},\n"
        f"    CASE WHEN doc_id % 4 = 0 THEN {l1} END,\n"
        "    CASE WHEN doc_id % 3 = 0 THEN 'click here' END,\n"
        f"    {l4},\n"
        "    CASE WHEN doc_id % 5 = 0 THEN"
        " 'powered by javascript widgets for dynamic content.' END,\n"
        "    CASE WHEN doc_id % 7 = 0 THEN"
        " 'lorem ipsum dolor sit amet consectetur.' END,\n"
        "    CASE WHEN doc_id % 11 = 0 THEN"
        " '{ var config = load(); }' END,\n"
        "    'subscribe to the newsletter for more updates today.'"
        ") AS text\n"
        "  FROM documents\n"
        ")"
    )


def lines_docs_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`lines_cte` (DataFrame API). The token
    array is projected to a real column first (the n+1-tokenizations
    rule, decontam.py), then both content lines slice the attribute."""
    from pyspark.sql import functions as F

    from .functions.text import tokens_ws

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select("doc_id", tokens_ws(F.col("text")).alias("__t"))
    l1 = F.concat(
        F.array_join(F.slice("__t", 1, 8), " "),
        F.lit(" alpha beta gamma delta."),
    )
    l4 = F.concat(
        F.array_join(F.slice("__t", 9, 6), " "),
        F.lit(" epsilon zeta eta theta?"),
    )
    did = F.col("doc_id")
    text_ml = F.concat_ws(
        "\n",
        l1,
        F.when(did % 4 == 0, l1),
        F.when(did % 3 == 0, F.lit("click here")),
        l4,
        F.when(
            did % 5 == 0,
            F.lit("powered by javascript widgets for dynamic content."),
        ),
        F.when(did % 7 == 0, F.lit("lorem ipsum dolor sit amet consectetur.")),
        F.when(did % 11 == 0, F.lit("{ var config = load(); }")),
        F.lit("subscribe to the newsletter for more updates today."),
    )
    out = d.select("doc_id", text_ml.alias("text"))
    # same small-file split-cap mitigation as docs_from_testdata
    return out.repartition(spark.sparkContext.defaultParallelism)


def gopher_cte(dialect: str = "duckdb") -> str:
    """Multi-line fixture for the Gopher quality/repetition gates
    (functions/gopher.py): derives from each doc a text exercising
    every signal branch — a stopword-rich terminal line from the
    doc's own tokens, a bullet line on doc_id%2, an ellipsis-ended
    line on %3, a hash-symbol line on %5, a unicode-… line on %7,
    and (on %4) a 10-word sentence repeated twice so dup-5..10-gram
    character mass is non-zero. NULL branches vanish via concat_ws.
    DuckDB dialect only — the Spark side is
    :func:`gopher_docs_from_testdata`."""
    if dialect != "duckdb":
        raise ValueError("gopher_cte is the DuckDB oracle side only")
    from .functions.text import tokens_ws_sql

    t = tokens_ws_sql("text")
    l1 = (
        f"array_to_string(list_slice({t}, 1, 30), ' ')"
        " || ' the cat and the dog went to be part of that have with us.'"
    )
    rep = "'pack my box with five dozen liquor jugs right now'"
    return (
        "gopher_docs AS (\n"
        "  SELECT doc_id, concat_ws(chr(10),\n"
        f"    {l1},\n"
        "    CASE WHEN doc_id % 2 = 0 THEN"
        " '• bullet point entry in the list' END,\n"
        "    CASE WHEN doc_id % 3 = 0 THEN"
        " 'read the full story and much more...' END,\n"
        "    CASE WHEN doc_id % 5 = 0 THEN"
        " 'tagged #data #spark #quality here' END,\n"
        "    CASE WHEN doc_id % 7 = 0 THEN 'to be continued…' END,\n"
        f"    CASE WHEN doc_id % 4 = 0 THEN {rep} END,\n"
        f"    CASE WHEN doc_id % 4 = 0 THEN {rep} END\n"
        ") AS text\n"
        "  FROM documents\n"
        ")"
    )


def gopher_docs_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`gopher_cte` (DataFrame API; token array
    projected to a real column first)."""
    from pyspark.sql import functions as F

    from .functions.text import tokens_ws

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select("doc_id", tokens_ws(F.col("text")).alias("__t"))
    l1 = F.concat(
        F.array_join(F.slice("__t", 1, 30), " "),
        F.lit(" the cat and the dog went to be part of that have with us."),
    )
    rep = F.lit("pack my box with five dozen liquor jugs right now")
    did = F.col("doc_id")
    text_ml = F.concat_ws(
        "\n",
        l1,
        F.when(did % 2 == 0, F.lit("• bullet point entry in the list")),
        F.when(did % 3 == 0, F.lit("read the full story and much more...")),
        F.when(did % 5 == 0, F.lit("tagged #data #spark #quality here")),
        F.when(did % 7 == 0, F.lit("to be continued…")),
        F.when(did % 4 == 0, rep),
        F.when(did % 4 == 0, rep),
    )
    out = d.select("doc_id", text_ml.alias("text"))
    # same small-file split-cap mitigation as docs_from_testdata
    return out.repartition(spark.sparkContext.defaultParallelism)


def eval_cte(dialect: str = "duckdb") -> str:
    """Benchmark/eval-suite fixture for the decontamination gate:
    for every 37th document, the eval "prompt" is tokens 4..13 of the
    normalized doc text — guaranteed word-8-gram overlap with the
    source document (and its planted dups), zero overlap for most of
    the rest of the corpus. DuckDB dialect only: the Spark side is
    built with the DataFrame API (:func:`eval_suite_from_testdata`),
    so no Spark-SQL string-escape variant is needed."""
    if dialect != "duckdb":
        raise ValueError("eval_cte is the DuckDB oracle side only")
    from .functions.text import tokens_ws_sql

    t = tokens_ws_sql("text")
    return (
        "eval_suite AS (\n"
        "  SELECT doc_id AS eval_id,\n"
        f"         array_to_string(list_slice({t}, 4, 13), ' ') AS text\n"
        "  FROM documents WHERE doc_id % 37 = 0\n"
        ")"
    )


def eval_suite_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`eval_cte` (DataFrame API)."""
    from pyspark.sql import functions as F

    from .functions.text import tokens_ws

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_ws(F.col("text"))
    return docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(toks, 4, 10), " ").alias("text"),
    )


DIRTY_VEC_CTE = """
dirty_vecs AS (
  SELECT vec_id,
    CASE
      WHEN vec_id % 50 = 0 THEN embedding[1:32]
      WHEN vec_id % 50 = 1 THEN list_transform(embedding, x -> x * 4.0::FLOAT)
      WHEN vec_id % 50 = 2 THEN list_transform(embedding, x -> x * 0.0625::FLOAT)
      WHEN vec_id % 50 = 3 THEN [NULL::FLOAT] || embedding[2:64]
      WHEN vec_id % 50 = 4 THEN ['NaN'::FLOAT] || embedding[2:64]
      WHEN vec_id % 50 = 5 THEN NULL
      ELSE embedding
    END AS embedding
  FROM embeddings
)
"""


def dirty_vecs_cte(dialect: str = "duckdb") -> str:
    """Deterministically corrupted embeddings for the vector-validation
    gate (functions/vectors.py) — the raw fixture is 500 clean
    unit-norm 64-dim vectors, so the gate would be vacuous without
    planted defects. Per vec_id % 50 residue: 0 → truncated to 32
    dims; 1 → scaled ×4 (norm_high); 2 → scaled ×0.0625 (norm_low —
    both scales are powers of two, so the float multiplies are EXACT
    in both engines and the norms carry zero cross-dialect rounding
    risk); 3 → first element NULL; 4 → first element NaN; 5 → whole
    vector NULL. DuckDB dialect only (list functions diverge) — the
    Spark side is :func:`dirty_vecs_from_testdata`."""
    if dialect != "duckdb":
        raise ValueError("dirty_vecs_cte is the DuckDB oracle side only")
    return DIRTY_VEC_CTE


def dirty_vecs_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`dirty_vecs_cte` (DataFrame API)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m = F.col("vec_id") % 50
    v = F.col("embedding")
    f32 = lambda c: F.lit(c).cast("float")  # noqa: E731
    dirty = (
        F.when(m == 0, F.slice(v, 1, 32))
        .when(m == 1, F.transform(v, lambda x: x * f32(4.0)))
        .when(m == 2, F.transform(v, lambda x: x * f32(0.0625)))
        .when(m == 3, F.concat(F.array(f32(None)), F.slice(v, 2, 63)))
        .when(m == 4, F.concat(F.array(f32(float("nan"))), F.slice(v, 2, 63)))
        .when(m == 5, F.lit(None).cast("array<float>"))
        .otherwise(v)
    )
    return df.select("vec_id", dirty.alias("embedding"))
