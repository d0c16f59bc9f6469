"""JSON ingestion, the Spark analog of satya's byte-level validators
(``validate_json_bytes`` / ``validate_json_array_bytes`` /
``validate_ndjson_bytes``, reference ``src/lib.rs:394-549``).

satya streams serde events and never materializes values; Spark's
JSON datasource does the same thing at the Jackson layer, and
PERMISSIVE mode gives us satya's per-record pass/fail semantics:
a malformed line lands in ``_corrupt_record`` instead of failing the
job (the analog of the streaming array path where element failure
doesn't abort the array, ``src/lib.rs:459-499``). Parse failure and
constraint failure are kept distinct, like satya's malformed-JSON
error vs field errors (``src/satya/validator.py:466-503``).

At 100 TB: NDJSON splits by newline across executors (Spark file
splits = satya's 8 KB chunking, ``src/satya/validator.py:425-455``,
done right); schema is always DECLARED (no inference scan).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _reader_schema(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """NDJSON → rows + ``json_ok`` flag (one bool per line — the
    Vec<bool> of validate_ndjson_bytes, src/lib.rs:501-523)."""
    df = spark.read.schema(_reader_schema(schema)).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", CORRUPT_COL).json(path)
    return df.withColumn("json_ok", F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def parse_json_objects(
    df: DataFrame, json_col: str, schema: T.StructType
) -> DataFrame:
    """Single-object-per-value parse (validate_json_bytes analog,
    src/lib.rs:394-413). PERMISSIVE from_json yields an all-null
    struct (not a null struct) for malformed input, so malformed-ness
    is detected via the corrupt-record side channel: json_ok=false
    for unparseable documents, fields null."""
    parsed = df.withColumn(
        "__j",
        F.from_json(
            F.col(json_col),
            _reader_schema(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    out = parsed.withColumn("json_ok", F.col(f"__j.{CORRUPT_COL}").isNull())
    for f in schema.fields:
        out = out.withColumn(f.name, F.col(f"__j.{f.name}"))
    return out.drop("__j")


def parse_json_array(
    df: DataFrame, json_col: str, item_schema: T.StructType
) -> DataFrame:
    """Top-level-array parse (validate_json_array_bytes analog,
    src/lib.rs:417-440): explode items to rows with per-item index;
    malformed arrays yield zero rows with json_ok=false retained via
    the ``arr_ok`` marker row semantics of the caller."""
    arr_schema = T.ArrayType(item_schema)
    parsed = df.withColumn("__a", F.from_json(F.col(json_col), arr_schema))
    exploded = parsed.select(
        "*", F.posexplode_outer("__a").alias("item_idx", "__item")
    )
    out = exploded.withColumn("json_ok", F.col("__item").isNotNull())
    for f in item_schema.fields:
        out = out.withColumn(f.name, F.col(f"__item.{f.name}"))
    return out.drop("__a", "__item")


def to_ndjson(df: DataFrame, cols: Optional[list[str]] = None):
    """Serialization sink (model_dump_json analog,
    src/satya/__init__.py:732-794): one JSON document per row."""
    cols = cols or df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("json"))
