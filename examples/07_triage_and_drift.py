"""Example: the validation TRIAGE tier — when a run reports millions
of violations, these are the bounded queries an operator actually
looks at: a few sample rows per constraint, the worst conversations,
which segment's distribution drifted, and whether the snapshot's
column profiles moved."""

import sys

from pyspark.sql import functions as F

from satya_spark.compiler import compile_spec
from satya_spark.crossrow import (
    column_quantiles,
    profile_drift,
    schema_drift,
    top_violating_groups,
    violations_sample,
)
from satya_spark.drift import psi_by_group
from satya_spark.session import get_spark
from satya_spark.spec import transcript_spec
from satya_spark.transcripts import synthesize

KEYS = ["conv_id", "turn_idx"]


def main() -> int:
    spark = get_spark(app_name="example-triage", cpus=4, shuffle_partitions=8)
    df = synthesize(spark, n_conv=4000, partitions=4)
    viol = compile_spec(transcript_spec()).violations_df(df, KEYS)

    # 1. two examples per failing (field, constraint) — bounded output
    #    no matter how many rows a bad constraint flags
    sample = violations_sample(viol, KEYS, n=2).collect()
    print(f"violation sample ({len(sample)} rows):")
    for r in sample[:6]:
        print(
            f"  {r['field']}.{r['constraint_name']} rk{r['rk']}: "
            f"{r['conv_id']}/{r['turn_idx']} -> {r['offending_value']!r}"
        )

    # 2. worst conversations by violation count (salted count + top-n)
    worst = top_violating_groups(viol, "conv_id", n=3).collect()
    print("worst convs:", [(r["conv_id"], r["n_violations"]) for r in worst])

    # 3. which ROLE's text-length distribution diverges from the table
    metric = df.select(
        F.coalesce("role", F.lit("<null>")).alias("role"),
        F.coalesce(F.length("text"), F.lit(0)).alias("text_len"),
    )
    for r in psi_by_group(metric, "text_len", "role", 200.0, 20).collect():
        print(f"  role={r['grp']:<12} psi={r['psi']:.4f} n={r['n_rows']}")

    # 4. quantile profile (production GK-sketch path)
    q = column_quantiles(
        metric.select("text_len"), ["text_len"], exact=False
    ).collect()[0]
    print(f"text_len quartiles: {q['q25']} / {q['q50']} / {q['q75']}")

    # 5. snapshot-over-snapshot checks: schema diff (metadata-only)
    #    + per-field profile deltas
    old, new = df.filter("turn_idx % 2 = 0"), df.filter("turn_idx % 2 = 1")
    assert schema_drift(old, new) == []  # same producer contract
    deltas = profile_drift(old, new, ["role", "tool"]).collect()
    for r in deltas:
        print(
            f"  {r['field']}: null_rate {r['null_rate_old']} -> "
            f"{r['null_rate_new']} (delta {r['null_rate_delta']})"
        )

    assert sample and worst
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
