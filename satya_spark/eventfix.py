"""Events fixture + spec: the engine applied to a second table shape
(driver's ``events`` stream table), with planted violations via a
shared Spark/DuckDB CTE (same pattern as transcripts.py/docfix.py).

Planted rows (event_id % 101 == 0, re-keyed +1,000,000):
  event_type='hover'  -> enum violation
  value=-1.0          -> gt violation
  props='not json'    -> JSON-validity violation
  user_id += 9999     -> dangling reference vs customer
Planted rows (event_id % 103 == 0, re-keyed +2,000,000):
  props='[1,2]'       -> valid JSON but NOT an object -> JSON rule
                         (the Spark/DuckDB divergence case from the
                         round-1 advice: bare json_valid accepts it)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .spec import FieldSpec, RowRule, TableSpec

EVENTS_CTE = """
ev AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM events
  UNION ALL
  SELECT event_id + 1000000, ts, user_id + 9999, 'hover', -1.0, 'not json'
  FROM events WHERE event_id % 101 = 0
  UNION ALL
  SELECT event_id + 2000000, ts, user_id, 'click', 1.0, '[1,2]'
  FROM events WHERE event_id % 103 = 0
)
"""


def events_with_clause() -> str:
    return "WITH " + EVENTS_CTE


def events_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(events_with_clause() + " SELECT * FROM ev")


def events_spec() -> TableSpec:
    """Constraint spec for the events table — a second, differently
    shaped deployment of the same engine (JSON-validity as a custom
    row rule, the @model_validator analog)."""

    def _props_invalid():
        from pyspark.sql import functions as F

        return F.col("props").isNotNull() & F.from_json(
            "props", "map<string,string>"
        ).isNull()

    return TableSpec(
        name="events",
        fields=(
            FieldSpec("event_id", "long", required=True, ge=0),
            FieldSpec("ts", "timestamp", required=True),
            FieldSpec("user_id", "long", required=True, ge=0),
            FieldSpec(
                "event_type",
                "string",
                required=True,
                enum=("click", "view", "purchase", "signup", "error"),
            ),
            FieldSpec("value", "double", required=True, gt=0.0, le=1000.0),
            FieldSpec("props", "string", required=False, max_length=10000),
        ),
        unique_key=("event_id",),
        references=(("user_id", "customer"),),
        row_rules=(
            RowRule(
                # Spark semantics: props must parse as a JSON OBJECT
                # (from_json map<string,string> nulls on arrays /
                # scalars). The oracle matches exactly: bare
                # json_valid() would accept '[1,2]' / '123' (verified
                # divergence, round-1 advice) — json_type must be
                # OBJECT too.
                "props_json_valid",
                _props_invalid,
                "(props IS NOT NULL AND NOT (json_valid(props)"
                " AND json_type(props) = 'OBJECT'))",
            ),
        ),
    )
