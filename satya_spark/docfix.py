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
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(docs_with_clause() + " SELECT * FROM docs")


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
    return spark.sql(pii_with_clause() + " SELECT * FROM pii_docs")


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
