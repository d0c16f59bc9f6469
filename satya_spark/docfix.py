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
