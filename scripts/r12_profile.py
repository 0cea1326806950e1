"""r12 optimization profiler: per-query wall (min-of-N noop runs) plus
Spark JOB COUNT per run — the iterative queries' cost at bench SF is
round-scheduling, so job count is the first-order signal the bench
seconds alone don't show.

Usage: python scripts/r12_profile.py [-n passes] q1 q2 ...
Writes one line per query: name, min_sec, all passes, jobs/run.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (  # noqa: E402
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r12-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    # warm at sf0.001 (codegen) like bench.py
    warm = "/root/testdata/sf0.001"
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warm {name} FAILED: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
    results = {}
    for name in names:
        fn, _ = REGISTRY[name]
        ts, jobs = [], []
        for _ in range(n):
            grp = f"prof-{name}-{len(ts)}"
            sc.setJobGroup(grp, name)
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name} FAILED: {exc}", file=sys.stderr)
                break
            ts.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(grp)))
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
        if ts:
            results[name] = {"min": min(ts), "passes": ts, "jobs": jobs[0]}
            print(
                f"{min(ts):8.3f}s  jobs={jobs[0]:4d}  {name}  passes={ts}",
                flush=True,
            )
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
