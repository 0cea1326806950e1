"""Time-vs-N scale probe for the Fellegi-Sunter linkage family
(fellegi_sunter_linkage, entity_resolution_clusters) — the heaviest
r9 additions (~3.8 s at sf0.1), never probed.

The pair join is nation-blocked, so cost is inherently quadratic in
BLOCK size (standard linkage discipline; at 100 TB the block key
refines). The scale question is therefore: does wall time track the
CANDIDATE-PAIR volume linearly? Replicas get disjoint nation keys
(nationkey + i*1000) and disjoint cust keys, so no cross-replica pair
can form and pair volume is structurally N x the N=1 volume; linear
time-vs-N == cost proportional to candidates, the right discipline.

Pair volume is also measured analytically (Sum C(block,2)) to confirm
the structure. Shuffle partitions scale with N (the r8 lesson: fixed
partitions conflate spill with plan cost).

Usage: python scripts/scale_probe_linkage.py [N ...]   (default 1 4 10)
"""
import os
import shutil
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.analytics import (
    q_entity_resolution_clusters,
    q_fellegi_sunter_linkage,
)

SF = "/root/testdata/sf0.1"


def build_probe_dir(spark, n: int) -> str:
    base = spark.read.parquet(f"{SF}/customer.parquet")
    parts = []
    for i in range(n):
        parts.append(
            base.select(
                (F.col("c_custkey") + F.lit(i * 10_000_000)).alias(
                    "c_custkey"
                ),
                F.col("c_name"),
                (F.col("c_nationkey") + F.lit(i * 1000)).alias(
                    "c_nationkey"
                ),
                F.col("c_mktsegment"),
                F.col("c_acctbal"),
            )
        )
    out = f"/tmp/probe_linkage_n{n}"
    shutil.rmtree(out, ignore_errors=True)
    reduce(lambda a, b: a.unionByName(b), parts).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "customer.parquet"))
    return out


def pair_volume(spark, sf_dir: str) -> int:
    """Sum C(block,2) over nation blocks — the blocked join's exact
    candidate-pair count."""
    return int(
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("c"))
        .collect()[0]
        .c
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
            .appName(f"scale-probe-linkage-n{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        d = build_probe_dir(spark, n)
        cands = pair_volume(spark, d)
        for label, fn in (
            ("fellegi_top20", q_fellegi_sunter_linkage),
            ("er_clusters", q_entity_resolution_clusters),
        ):
            times, rows = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(
                f"N={n:2d} {label}: rows={rows} cands={cands} "
                f"times={[round(t, 2) for t in times]} min={min(times):.2f}s",
                flush=True,
            )
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
