"""Example: training-data dedup sweep — exact → MinHash-LSH →
embedding near-dup, plus text quality filtering."""

import sys

from pyspark.sql import functions as F

from satya_spark.functions import text as tx
from satya_spark.functions.dedup import (
    dup_clusters,
    exact_dup_groups,
    minhash_dedup_pairs,
)
from satya_spark.session import get_spark


def main() -> int:
    spark = get_spark(app_name="example-dedup", cpus=4, shuffle_partitions=8)
    base = " ".join(f"token{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base, "en"),                 # exact dup of 1
            (3, base + " tail", "en"),       # near dup of 1
            (4, "short", "en"),              # low quality (too short)
            (5, "completely different words here now", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    exact = exact_dup_groups(docs).collect()
    near_df = minhash_dedup_pairs(docs, threshold=0.6)
    near = near_df.collect()
    print("exact dup groups:", [(r["canonical_id"], r["n_docs"]) for r in exact])
    print("near-dup pairs  :", [(r["id_a"], r["id_b"], r["jac"]) for r in near])

    # pairs -> connected components -> keep one doc per cluster
    # (near-duplication is not transitive: 1~2~3 must drop 2 docs, not
    # 2-per-pair; dup_clusters labels each member with min cluster id)
    clusters = dup_clusters(near_df)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id"))
    survivors = docs.join(drop, "doc_id", "left_anti")
    print("clusters        :", sorted(
        (r["doc_id"], r["cluster_id"]) for r in clusters.collect()))
    n_kept = survivors.count()
    print(f"cluster dedup keeps {n_kept}/5 docs")

    scored = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("q")
    )
    kept = scored.filter("q >= 0.5").count()
    print(f"quality filter keeps {kept}/5 docs")
    assert len(exact) == 1 and any({r["id_a"], r["id_b"]} == {1, 3} or
                                   {r["id_a"], r["id_b"]} == {2, 3} for r in near)
    # {1,2,3} is one component -> doc 1 survives, 2 and 3 drop
    assert n_kept == 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
