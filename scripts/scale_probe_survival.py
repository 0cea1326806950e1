"""Time-vs-N scale probe for the r9 survival/causal family:
log_rank_conversion_survival, nelson_aalen_hazard, iv_wald_estimate
over N user-offset replicas of sf0.1 events at N = 1, 4, 10.

Replica design: user_id += i*10_000_000 per replica with ts/values
unchanged — the user population scales exactly N× while each user's
stream is identical, so the purchase-value histogram scales uniformly
(same 90th-pct cut), conversions scale exactly N×, and the per-day
death/at-risk tables keep the same row count (calendar-bounded). The
registered plans are probed DIRECTLY: replicas are written to a temp
sf-dir and the REGISTRY callables run against it (no probe/plan
drift). Shuffle partitions scale with N (r8 link-prediction lesson).

Usage: python scripts/scale_probe_survival.py [N ...]   (default 1 4 10)
"""
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
    REGISTRY,
)

SF = "/root/testdata/sf0.1"
QUERIES = (
    "log_rank_conversion_survival",
    "nelson_aalen_hazard",
    "iv_wald_estimate",
)


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", str(32 * max(1, n // 2)))
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .appName(f"scale-probe-survival-n{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        base = spark.read.parquet(f"{SF}/events.parquet")
        parts = [
            base.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 10_000_000)
            )
            for i in range(n)
        ]
        rep = reduce(lambda a, b: a.unionByName(b), parts)
        d = tempfile.mkdtemp(prefix=f"probe_surv_n{n}_")
        rep.write.mode("overwrite").parquet(f"{d}/events.parquet")
        for name in QUERIES:
            fn, _ = REGISTRY[name]
            times, rows = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(
                f"N={n:2d} {name}: rows={rows} "
                f"times={[round(t, 2) for t in times]} min={min(times):.2f}s",
                flush=True,
            )
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
