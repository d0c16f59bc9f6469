"""Example: the Model declaration surface — a reference satya user's
``class User(Model)`` pasted in, validated one record at a time AND as
one codegen'd DataFrame pass (the same declaration drives both).
"""

import sys
from typing import List, Optional

from pyspark.sql import functions as F

from satya_spark.model import (
    EmailStr,
    Field,
    Model,
    ModelValidationError,
    PositiveInt,
    SecretStr,
)
from satya_spark.session import get_spark


class User(Model):
    name: str = Field(min_length=2, max_length=30)
    age: PositiveInt
    email: Optional[EmailStr] = None
    tags: Optional[List[str]] = None
    api_key: Optional[SecretStr] = None


def main() -> int:
    spark = get_spark(app_name="example-model", cpus=4, shuffle_partitions=8)
    User.validator(spark)

    # single records — reference call shape
    ok = User(name="Ada", age=36, email="ada@example.com")
    print("valid:", ok.model_dump(exclude_none=True))
    try:
        User(name="x", age=0, api_key="leaked-secret")
    except ModelValidationError as e:
        print(f"rejected with {len(e.errors)} errors:")
        for err in e.errors:
            print("  -", str(err).splitlines()[0],
                  f"(value={err.value!r})" if err.value is not None else "")
        assert all(err.value != "leaked-secret" for err in e.errors)

    # the SAME class at table scale: one whole-stage-codegen pass
    df = spark.range(10_000).select(
        F.concat(F.lit("user"), F.col("id").cast("string")).alias("name"),
        F.when(F.col("id") % 97 == 0, -1).otherwise(F.col("id") % 80 + 1)
        .cast("long")
        .alias("age"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@example.com")),
        ).alias("email"),
    )
    out = User.validate_df(df)
    n_bad = out.filter(~F.col("valid")).count()
    print(f"table pass: {df.count()} rows, {n_bad} invalid (planted ~103)")
    assert 90 < n_bad < 120
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
