"""Example: validate a transcript table end-to-end.

Mirrors the reference's examples/ scripts (run as tests via
tests/test_examples.py, like the reference's test_all_examples.py).
"""

import sys

from satya_spark.engine import ValidationEngine
from satya_spark.session import get_spark
from satya_spark.spec import transcript_spec
from satya_spark.transcripts import synthesize, synthesize_tool_catalog


def main() -> int:
    spark = get_spark(app_name="example-validate", cpus=4, shuffle_partitions=8)
    df = synthesize(spark, n_conv=500)
    eng = ValidationEngine(transcript_spec(), n_shards=16)
    run = eng.run(df, catalogs={"tool_catalog": synthesize_tool_catalog(spark)})

    verdicts = run.shard_verdicts.collect()
    total = sum(r["n_rows"] for r in verdicts)
    invalid = sum(r["n_invalid_rows"] for r in verdicts)
    print(f"validated {total} turns; {invalid} invalid rows "
          f"across {len(verdicts)} shards")
    print("top violations:")
    for r in (
        eng.field_violation_counts(df).orderBy("field").collect()[:5]
    ):
        print(f"  {r['field']}.{r['constraint_name']}: {r['n']}")
    dangling = run.referential["tool"].count()
    print(f"dangling tool references: {dangling}")
    assert total > 0 and invalid > 0 and dangling > 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
