"""Example: nested Model composition — a reference satya user's
``Dict[str, Model]`` / ``List[Model]`` / model-typed-field classes
(the shapes of reference tests/test_nested_models.py) validated one
record at a time AND as one struct-kernel DataFrame pass."""

import sys
from typing import Dict, List

from pyspark.sql import functions as F

from satya_spark.model import Field, Model, ModelValidationError
from satya_spark.session import get_spark


class SystemConfig(Model):
    buffer_size: int = Field(ge=256, le=100000)
    learning_rate: float = Field(ge=0.0, le=1.0)


class Experiment(Model):
    config: SystemConfig = Field(description="run configuration")
    accuracy: float = Field(ge=0.0, le=1.0)
    tags: List[str] = Field(default_factory=list)


class Suite(Model):
    name: str = Field(min_length=3)
    runs: Dict[str, Experiment] = Field(description="runs by id")


def main() -> int:
    spark = get_spark(app_name="example-nested", cpus=4, shuffle_partitions=8)
    for cls in (SystemConfig, Experiment, Suite):
        cls.validator(spark)

    # single records — nested dicts hydrate into Model instances
    suite = Suite(
        name="sweep-1",
        runs={
            "a": {"config": {"buffer_size": 1024, "learning_rate": 0.01},
                  "accuracy": 0.91},
            "b": {"config": {"buffer_size": 2048, "learning_rate": 0.001},
                  "accuracy": 0.93},
        },
    )
    print("valid:", suite.runs["a"].config.buffer_size,
          suite.model_dump()["runs"]["b"]["accuracy"])

    try:
        Suite(name="bad", runs={"x": {"config": {"buffer_size": 7,
                                                 "learning_rate": 3.0},
                                      "accuracy": 0.5}})
    except ModelValidationError as e:
        print(f"rejected with {len(e.errors)} errors (dotted paths):")
        for err in e.errors:
            print("  -", str(err).splitlines()[0])
        assert any("buffer_size" in str(err) for err in e.errors)

    # default_factory isolation: instances never share the list
    e1 = Experiment(config={"buffer_size": 512, "learning_rate": 0.1},
                    accuracy=0.8)
    e2 = Experiment(config={"buffer_size": 512, "learning_rate": 0.1},
                    accuracy=0.8)
    e1.tags.append("hot")
    assert e1.tags == ["hot"] and e2.tags == []

    # the SAME declaration at table scale: struct-element kernels
    df = spark.range(5_000).select(
        F.concat(F.lit("exp"), F.col("id").cast("string")).alias("name"),
        F.map_from_arrays(
            F.array(F.lit("run")),
            F.array(
                F.struct(
                    F.struct(
                        F.when(F.col("id") % 41 == 0, F.lit(16))
                        .otherwise(F.lit(1024))
                        .cast("bigint")
                        .alias("buffer_size"),
                        F.lit(0.01).alias("learning_rate"),
                    ).alias("config"),
                    (F.col("id") % 100 / 100.0).alias("accuracy"),
                    F.array().cast("array<string>").alias("tags"),
                )
            ),
        ).alias("runs"),
    )
    out = Suite.validate_df(df)
    bad = out.filter(~F.col("valid"))
    n_bad = bad.count()
    fields = {
        v["field"]
        for r in bad.select("violations").limit(50).collect()
        for v in r["violations"]
    }
    print(f"table pass: {df.count()} rows, {n_bad} invalid "
          f"(planted ~122), violating fields: {sorted(fields)}")
    assert 100 < n_bad < 140
    assert fields == {"runs[].config.buffer_size"}
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
