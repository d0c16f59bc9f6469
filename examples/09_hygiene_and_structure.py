"""Example: transcript structure checks + corpus decontamination.

The two transcript-native extensions beyond per-record validation:
sequence-level conversation checks (one conv_id window) and
benchmark decontamination (broadcast n-gram probe). Run as a test
via tests/test_examples.py.
"""

import sys

from pyspark.sql import functions as F

from satya_spark.convcheck import conversation_structure_violations
from satya_spark.functions.decontam import (
    contaminated_ids,
    contamination_report,
)
from satya_spark.session import get_spark
from satya_spark.transcripts import synthesize


def main() -> int:
    spark = get_spark(app_name="example-hygiene", cpus=4, shuffle_partitions=8)

    # --- 1. sequence-level structure checks over a synthetic corpus
    df = synthesize(spark, n_conv=800)
    struct = conversation_structure_violations(df)
    counts = {
        r["constraint_name"]: r["n"]
        for r in struct.groupBy("constraint_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print("structure violations:", dict(sorted(counts.items())))
    assert counts.get("role_unknown", 0) > 0  # synthesize plants moderators
    assert counts.get("tool_on_invalid_role", 0) > 0

    # --- 2. decontaminate a toy corpus against an "eval suite"
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog at dawn"),
            (2, "pack my box with five dozen liquor jugs tonight again"),
            (3, "completely unrelated text about spark physical plans here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            ("quick brown fox jumps over the lazy dog",),
            ("five dozen liquor jugs",),
        ],
        "text string",
    )
    report = contamination_report(docs, bench, n=8)
    for r in report.orderBy("doc_id").collect():
        print(
            f"doc {r['doc_id']}: {r['n_hit']}/{r['n_grams']} grams overlap "
            f"(share {r['share']})"
        )
    drop = {r["doc_id"] for r in contaminated_ids(docs, bench, n=8).collect()}
    assert drop == {1}  # doc 2's overlap is only 4 tokens (< n)
    print("dropped doc ids:", sorted(drop))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
