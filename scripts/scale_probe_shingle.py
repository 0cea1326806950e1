"""Time-vs-N scale probe for shingle_containment_pairs (r9, VERDICT r8
item 1 done-gate): union N salted replicas of sf0.1 documents and
measure wall time at N = 1, 4, 10.

Replica design (NOTES.md probe-trap, same as scale_probe_heavy.py):
every token gets an r{i}x prefix so cross-replica shingle overlap is
exactly zero — pair volume must scale N×, never replica-cross. Shuffle
partitions scale with N (the link-prediction probe's lesson: fixed
partitions conflate partition-spill with plan superlinearity).

Usage: python scripts/scale_probe_shingle.py [N ...]   (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.olap import (
    shingle_containment_core,
)

SF = "/root/testdata/sf0.1"


def docs_n(spark, n: int):
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    parts = []
    for i in range(n):
        text = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(^|\s)", f"$1r{i}x")
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "lang",
                text.alias("text"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", str(32 * max(1, n // 2)))
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .appName(f"scale-probe-shingle-n{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        d = docs_n(spark, n).localCheckpoint(eager=True)  # exclude build
        times, pairs = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            pairs = shingle_containment_core(spark, d).count()
            times.append(time.perf_counter() - t0)
        print(
            f"N={n:2d} pairs={pairs} times={[round(t, 2) for t in times]} "
            f"min={min(times):.2f}s",
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
