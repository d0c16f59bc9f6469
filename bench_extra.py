"""Per-query isolation harness (guide §1.4) — NOT the driver bench.

Times individual declared queries with the noop sink (computes every
column, no sink cost), prints per-query seconds, and optionally dumps
``.explain("formatted")`` to plans/r06/<name>_<tag>.txt.

Usage:
    python bench_extra.py q1 q2 ...            # time queries (noop sink)
    python bench_extra.py --plan TAG q1 q2 ... # also dump plans
    python bench_extra.py --reps N ...         # best-of-N (default 3)

The methodology mirrors bench.py (warm run, then best-of-N) so numbers
are comparable, but the sink here is noop for ALL queries (bench.py
uses collect/count per its frozen contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    plan_tag = None
    reps = 3
    sink = "noop"
    while args and args[0].startswith("--"):
        if args[0] == "--plan":
            plan_tag = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        elif args[0] == "--sink":
            sink = args[1]  # noop | count | collect
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")

    import tempfile

    import __spark_entry__ as entrymod
    from satya_spark.session import get_spark
    from satya_spark.transcripts import stage_fixture

    spark = get_spark(app_name="bench-extra", cpus=CPUS)
    # mirror bench.py phase1: queries run against the staged fixture
    stage_fixture(
        spark, SF_DIR, os.path.join(tempfile.mkdtemp(prefix="bx_"), "fixture")
    )
    qs = entrymod.queries()
    names = args or sorted(qs)
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]

        def run():
            df = fn(spark, SF_DIR)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            elif sink == "count":
                df.count()
            else:
                df.collect()

        spark.sparkContext.setJobDescription(f"{name} (warm)")
        run()  # warm: plan + file listing + codegen
        best = float("inf")
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} (rep {i})")
            t0 = time.monotonic()
            run()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
        if plan_tag:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(plan)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
