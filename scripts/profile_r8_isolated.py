"""r8: isolated quiet min-of-3 for the queries whose IN-SUITE minima
exceed 2x their recorded (60-query-era) baseline minima. If a query
collapses to ~baseline when run alone, the in-suite inflation is
suite-context JVM pressure (codegen cache, GC, page cache turnover
across 213 queries x 3 passes), not a plan regression.

Usage: python scripts/profile_r8_isolated.py name [name ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
    REGISTRY,
)

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(
    app_name="profile-r8-isolated",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)

for name in sys.argv[1:]:
    fn, _ = REGISTRY[name]
    # warm at sf0.001 then one untimed pass at SF (the bench protocol)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{name:40s} {best:7.3f}s", flush=True)
