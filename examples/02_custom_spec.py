"""Example: declare a custom spec (satya Field-style) with a
cross-field rule, validate a small frame, dump survivors as NDJSON."""

import sys

from pyspark.sql import functions as F

from satya_spark.compiler import compile_spec
from satya_spark.serialize import dump_json
from satya_spark.session import get_spark
from satya_spark.spec import FieldSpec, RowRule, TableSpec


def main() -> int:
    spark = get_spark(app_name="example-spec", cpus=4, shuffle_partitions=8)

    spec = TableSpec(
        name="orders",
        fields=(
            FieldSpec("order_id", "long", required=True, ge=1),
            FieldSpec("email", "string", required=True, email=True),
            FieldSpec("status", "string", enum=("new", "paid", "shipped")),
            FieldSpec("qty", "int", ge=1, le=100),
            FieldSpec("unit_price", "double", gt=0.0),
        ),
        row_rules=(
            RowRule(
                "total_under_limit",
                lambda: F.col("qty") * F.col("unit_price") > 10_000,
                "(qty * unit_price > 10000)",
            ),
        ),
    )
    spec.validate()
    compiled = compile_spec(spec)

    df = spark.createDataFrame(
        [
            (1, "a@b.co", "paid", 2, 9.5),
            (2, "nope", "paid", 2, 9.5),
            (3, "a@b.co", "lost", 2, 9.5),
            (4, "a@b.co", "new", 100, 500.0),  # fails the row rule
        ],
        "order_id long, email string, status string, qty int, unit_price double",
    )
    ann = compiled.with_validation(df)
    good = ann.filter("valid").drop("valid", "violations")
    bad = compiled.violations_df(df, ["order_id"])
    print("violations:")
    for r in bad.orderBy("order_id").collect():
        print(f"  #{r['order_id']} {r['field']}.{r['constraint_name']}"
              f" = {r['offending_value']}")
    docs = [r["json"] for r in dump_json(good, spec).collect()]
    print("surviving NDJSON:", docs)
    assert len(docs) == 1 and '"order_id":1' in docs[0]
    return 0


if __name__ == "__main__":
    sys.exit(main())
