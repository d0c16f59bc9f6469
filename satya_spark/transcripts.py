"""Deterministic transcript fixtures.

Two generators:

1. :func:`from_tpch` — derives the transcripts table from the driver's
   ``lineitem`` parquet via a SINGLE SQL template executed by BOTH
   Spark SQL and DuckDB (dialect differences are confined to two
   token substitutions), so the correctness oracle sees byte-identical
   input. Violations are *planted* at deterministic modulus sites,
   mirroring satya's valid/invalid/boundary corpora
   (``tests/test_field_constraints.py``, ``tests/test_edge_cases.py``;
   see FIXTURES.md §F2).

2. :func:`synthesize` — pure-Spark arithmetic generator (no rand(), no
   Python row loop) producing N turns with a skewed conversation-size
   distribution including one hot conversation, for benchmarking and
   skew tests at arbitrary scale. All columns are derived from
   ``spark.range`` ids with integer arithmetic → deterministic and
   embarrassingly parallel (scales to any cluster size; generation is
   narrow, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- shared SQL template -------------------------------------------------
# __SPLIT__(expr) -> split(expr, ',') [Spark] / string_split(expr, ',') [DuckDB]
# Planted violation sites (modulus on l_orderkey), per FIXTURES.md F2:
#   %499  duplicate (conv_id, turn_idx) row            -> v_unique
#   %997  role='moderator'                             -> v_enum
#   %1009 role=NULL                                    -> v_null (required)
#   %991  text=''   %983 text='   '  %977 text 4001ch  -> v_length
#   %1019 text=NULL                                    -> v_null (required)
#   %1013 turn_idx=-1   %1031 turn_idx=10000001        -> v_bounds
#   %971  tool='Bad-Tool!'                             -> v_pattern
#   %967  tool='ghost_N' (dangling catalog ref)        -> v_ref
#   %953  meta_email='not-an-email'                    -> email kernel
#   %947  meta_url='htp:/bad url'                      -> url kernel
#   %941  score = k*0.25 + 0.1                         -> multiple_of kernel
#   %937  duplicate tag                                -> unique_items kernel
#   %929  six tags                                     -> max_items kernel
#   %1021 ts=NULL                                      -> v_null (required)
# Rows where several sites coincide violate >1 constraint at once
# (v_multi — accumulation semantics, tests/test_edge_cases.py:300-324).
_TRANSCRIPTS_TEMPLATE = """
base AS (
  SELECT l_orderkey AS okey, l_partkey, l_suppkey,
         l_quantity, l_returnflag, l_linestatus, l_shipdate,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                    l_returnflag, l_linestatus, l_shipdate
         ) AS ln
  FROM lineitem
),
src AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM base WHERE okey % 499 = 0 AND ln = 1
),
transcripts AS (
  SELECT
    concat('c', CAST(okey AS STRING)) AS conv_id,
    CASE WHEN okey % 1013 = 0 AND ln = 3 THEN -1
         WHEN okey % 1031 = 0 AND ln = 2 THEN 10000001
         ELSE ln - 1 END AS turn_idx,
    CASE WHEN okey % 997 = 0 AND ln = 2 THEN 'moderator'
         WHEN okey % 1009 = 0 AND ln = 3 THEN CAST(NULL AS STRING)
         WHEN ln = 1 THEN 'system'
         WHEN ln % 2 = 0 THEN 'user'
         ELSE 'assistant' END AS role,
    CASE WHEN okey % 991 = 0 AND ln = 1 THEN ''
         WHEN okey % 983 = 0 AND ln = 2 THEN '   '
         WHEN okey % 977 = 0 AND ln = 1 THEN repeat('x', 4001)
         WHEN okey % 1019 = 0 AND ln = 2 THEN CAST(NULL AS STRING)
         ELSE concat('turn ', CAST(ln - 1 AS STRING), ' ',
                     repeat(concat(l_returnflag, l_linestatus, ' '),
                            1 + (CAST(floor(l_quantity) AS INT) % 40)))
         END AS text,
    CASE WHEN okey % 971 = 0 AND ln = 2 THEN 'Bad-Tool!'
         WHEN okey % 967 = 0 AND ln = 3
           THEN concat('ghost_', CAST(okey % 7 AS STRING))
         WHEN ln % 3 = 0 THEN concat('tool_', CAST(l_partkey % 50 AS STRING))
         ELSE CAST(NULL AS STRING) END AS tool,
    CASE WHEN okey % 1021 = 0 AND ln = 1 THEN CAST(NULL AS TIMESTAMP)
         ELSE l_shipdate END AS ts,
    CASE WHEN okey % 953 = 0 AND ln = 1 THEN 'not-an-email'
         WHEN ln % 2 = 0
           THEN concat('user', CAST(l_suppkey AS STRING), '@example.com')
         ELSE CAST(NULL AS STRING) END AS meta_email,
    CASE WHEN okey % 947 = 0 AND ln = 1 THEN 'htp:/bad url'
         WHEN ln % 2 = 1
           THEN concat('https://example.com/p/', CAST(l_partkey AS STRING))
         ELSE CAST(NULL AS STRING) END AS meta_url,
    CASE WHEN okey % 941 = 0 AND ln = 1
           THEN CAST(floor(l_quantity) AS DOUBLE) * 0.25 + 0.1
         ELSE CAST(floor(l_quantity) AS DOUBLE) * 0.25 END AS score,
    __SPLIT__(CASE WHEN okey % 937 = 0 AND ln = 1
                     THEN concat(l_returnflag, ',', l_returnflag)
                   WHEN okey % 929 = 0 AND ln = 2 THEN 'a,b,c,d,e,f'
                   WHEN ln = 3 THEN CAST(NULL AS STRING)
                   ELSE concat(l_returnflag, ',', l_linestatus, ',',
                               CAST(ln AS STRING)) END) AS tags
  FROM src
),
tool_catalog AS (
  SELECT concat('tool_', CAST(p_partkey % 50 AS STRING)) AS tool
  FROM part GROUP BY 1
)
"""


def transcripts_cte(dialect: str) -> str:
    """The WITH-clause body for the given dialect ('spark'|'duckdb').

    Prepend ``WITH`` and append a SELECT. Exposes CTEs ``transcripts``
    and ``tool_catalog``.
    """
    if dialect == "spark":
        return _TRANSCRIPTS_TEMPLATE.replace("__SPLIT__(", "split_portable(")
    if dialect == "duckdb":
        return _TRANSCRIPTS_TEMPLATE.replace("__SPLIT__(", "split_portable(")
    raise ValueError(dialect)


def _expand_split(sql: str, dialect: str) -> str:
    # split_portable(expr) is a marker; expand to the dialect function.
    # Both engines split on a literal comma; Spark's split() takes a
    # regex but ',' has no metacharacters.
    if dialect == "spark":
        open_t, close_t = "split(", ", ',')"
    else:
        open_t, close_t = "string_split(", ", ',')"
    out = []
    i = 0
    marker = "split_portable("
    while True:
        j = sql.find(marker, i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        out.append(open_t)
        # find the matching close paren
        depth = 1
        k = j + len(marker)
        start = k
        while depth:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        out.append(sql[start : k - 1])
        out.append(close_t)
        i = k


def with_clause(dialect: str) -> str:
    """Full ``WITH ...`` prefix for queries over the derived fixture."""
    return "WITH " + _expand_split(transcripts_cte(dialect), dialect)


# sf_dir -> parquet path of a pre-staged fixture (see stage_fixture)
_STAGED: dict[str, str] = {}


def from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts DataFrame from ``{sf_dir}/lineitem.parquet``
    (or read the pre-staged copy when :func:`stage_fixture` ran)."""
    staged = _STAGED.get(sf_dir)
    if staged is not None:
        return spark.read.parquet(staged)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")
    return spark.sql(with_clause("spark") + " SELECT * FROM transcripts")


def stage_fixture(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Materialize the derived fixture ONCE and serve every subsequent
    :func:`from_tpch` call from parquet. The derivation includes a
    row_number window (sort + shuffle); without staging, a bench run
    of 36 gate queries pays that window 36 times and measures fixture
    derivation instead of the operators (round-1 verdict: most of the
    28.7s suite). Correctness gates do NOT stage — the driver compares
    the live derivation against DuckDB running the identical SQL."""
    from_tpch(spark, sf_dir).write.mode("overwrite").parquet(path)
    _STAGED[sf_dir] = path
    return path


def unstage_fixture(sf_dir: str) -> None:
    _STAGED.pop(sf_dir, None)


def tool_catalog_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT concat('tool_', CAST(p_partkey % 50 AS STRING)) AS tool "
        "FROM part GROUP BY 1"
    )


# --- scale synthesizer ----------------------------------------------------

_KNUTH = 2654435761  # Knuth multiplicative hash constant


def synthesize(
    spark: SparkSession,
    n_conv: int = 10_000,
    hot_factor: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    """Arithmetically deterministic transcript generator.

    Conversation ``i`` gets ``1 + (i*KNUTH mod 16)`` turns (~8.5 avg);
    conversation 0 gets ``hot_factor`` turns — the hot-key skew case
    the north rule's salted repartitioning must survive. Generation is
    a narrow map over ``spark.range`` (each partition generates its
    own slice; no shuffle, no driver data) — at 10^12 turns this is
    exactly how a cluster-scale synthetic load would be produced.
    """
    convs = spark.range(n_conv, numPartitions=partitions)
    convs = convs.withColumn(
        "n_turns",
        F.when(F.col("id") == 0, F.lit(hot_factor)).otherwise(
            1 + F.pmod(F.col("id") * F.lit(_KNUTH), F.lit(16))
        ).cast("int"),
    )
    t = convs.select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id").alias("cid"),
        F.posexplode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias(
            "turn_idx", "_"
        ),
    ).drop("_")
    h = F.pmod((F.col("cid") * 31 + F.col("turn_idx")) * F.lit(_KNUTH), F.lit(1000))
    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(h == 17, F.lit("moderator"))  # planted enum violation
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(h == 23, F.lit(""))  # planted min_length violation
        .otherwise(
            F.concat(
                F.lit("turn "),
                F.col("turn_idx").cast("string"),
                F.lit(" "),
                F.repeat(F.lit("lorem ipsum dolor sit amet "), (F.pmod(h, 24) + 1).cast("int")),
            )
        )
        .alias("text"),
        F.when(
            (F.col("turn_idx") % 5 == 4),
            F.concat(F.lit("tool_"), F.pmod(h, 50).cast("string")),
        )
        .when(h == 29, F.lit("ghost_tool"))  # planted dangling ref
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("cid") * 3600 + F.col("turn_idx") * 7
        ).alias("ts"),
        F.when(
            F.col("turn_idx") % 2 == 1,
            F.concat(F.lit("user"), F.col("cid").cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit(None).cast("string")).alias("meta_email"),
        F.when(
            F.col("turn_idx") % 2 == 0,
            F.concat(F.lit("https://example.com/c/"), F.col("cid").cast("string")),
        ).otherwise(F.lit(None).cast("string")).alias("meta_url"),
        (F.pmod(h, 40).cast("double") * 0.25).alias("score"),
        F.array(F.lit("a"), F.concat(F.lit("t"), F.pmod(h, 9).cast("string"))).alias(
            "tags"
        ),
    )


def synthesize_tool_catalog(spark: SparkSession) -> DataFrame:
    return spark.range(50).select(
        F.concat(F.lit("tool_"), F.col("id").cast("string")).alias("tool")
    )
