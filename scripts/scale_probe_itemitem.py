"""N=1/4/10 scale probe for item_item_cosine_parts' pairing stage.

Replica design: replica i offsets every customer AND part key by
i*10_000_000, so replicas are DISJOINT — no cross-replica baskets can
pair, per-customer basket sizes are unchanged, and the true pair count
is exactly N x the single-replica count. With the heavy-basket cap the
pairing is Sum_c n_c^2 <= cap * |baskets| (linear in data); an uncapped
quadratic shape would still be linear here (replicas are disjoint), so
the probe also reports the CAP'S effect: pairs generated with and
without the cap at each N.

Usage: python scripts/scale_probe_itemitem.py [N ...]  (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.1"
CAP = 25


def baskets(spark, n_rep):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    b0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    reps = [
        b0.select(
            (F.col("c") + F.lit(i * 10_000_000)).alias("c"),
            (F.col("p") + F.lit(i * 10_000_000)).alias("p"),
        )
        for i in range(n_rep)
    ]
    return reduce(lambda a, b: a.unionByName(b), reps)


def pair_count(b, cap):
    sz = b.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
    kept = b.join(sz, "c").filter(
        (F.col("n") >= 2) & (F.col("n") <= cap)
        if cap
        else F.col("n") >= 2
    )
    co = (
        kept.alias("x")
        .join(
            kept.alias("y"),
            (F.col("x.c") == F.col("y.c")) & (F.col("x.p") < F.col("y.p")),
        )
        .groupBy(F.col("x.p"), F.col("y.p"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return co.agg(
        F.sum("co").alias("pairs_generated"),
        F.count(F.lit(1)).alias("distinct_pairs"),
    ).collect()[0]


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark(
        app_name="probe-itemitem",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for n in ns:
        b = baskets(spark, n).localCheckpoint()
        t0 = time.time()
        capped = pair_count(b, CAP)
        wall = time.time() - t0
        uncapped = pair_count(b, None)
        print(
            f"N={n}: capped pairs_generated={capped.pairs_generated} "
            f"distinct={capped.distinct_pairs} wall={wall:.1f}s | "
            f"uncapped pairs_generated={uncapped.pairs_generated}"
        )


if __name__ == "__main__":
    main()
