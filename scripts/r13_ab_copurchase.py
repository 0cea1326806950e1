"""A/B probe for the co-purchase edge build (VERDICT r12 #5).

Shape A (current, in ~15 queries): distinct (orderkey, partkey) →
self-join on orderkey with partkey inequality → distinct (pa, pb).
3 exchanges (distinct li, join key, distinct pairs) + a join.

Shape B (candidate): groupBy(orderkey).collect_set(partkey) →
sort_array → posexplode + slice explode of within-order pairs →
distinct (pa, pb). 2 exchanges (group, distinct), no join; collect_set
dedupes (orderkey, partkey) for free and per-order arrays are bounded
by order size, so the explode fan-out is skew-free.

Also A/Bs the counted variant (groupBy(pa, pb).count()).

Usage: python scripts/r13_ab_copurchase.py [n_reps]
Prints min-of-N noop-sink seconds per shape, plus an edge-set equality
check at sf0.01.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (  # noqa: E402
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (  # noqa: E402
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def li_sampled(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .select("l_orderkey", "l_partkey")
    )


def shape_a_edges(spark, sf_dir):
    li = li_sampled(spark, sf_dir).distinct()
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )


def shape_b_edges(spark, sf_dir):
    grp = (
        li_sampled(spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    return (
        grp.select(F.posexplode("ps").alias("_i", "pa"), "ps")
        .select(
            "pa",
            F.explode(F.expr("slice(ps, _i + 2, size(ps))")).alias("pb"),
        )
        .distinct()
    )


def shape_a_counts(spark, sf_dir):
    li = li_sampled(spark, sf_dir).distinct()
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )


def shape_b_counts(spark, sf_dir):
    grp = (
        li_sampled(spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    return (
        grp.select(F.posexplode("ps").alias("_i", "pa"), "ps")
        .select(
            "pa",
            F.explode(F.expr("slice(ps, _i + 2, size(ps))")).alias("pb"),
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r13-ab-copurchase",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    shapes = {
        "A_edges": shape_a_edges,
        "B_edges": shape_b_edges,
        "A_counts": shape_a_counts,
        "B_counts": shape_b_counts,
    }
    # equality check at sf0.01 (cheap, exact)
    small = "/root/testdata/sf0.01"
    ea = sorted(map(tuple, shape_a_edges(spark, small).collect()))
    eb = sorted(map(tuple, shape_b_edges(spark, small).collect()))
    ca = sorted(map(tuple, shape_a_counts(spark, small).collect()))
    cb = sorted(map(tuple, shape_b_counts(spark, small).collect()))
    print(f"edges equal: {ea == eb} ({len(ea)} rows); "
          f"counts equal: {ca == cb} ({len(ca)} rows)")
    # warm
    for fn in shapes.values():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name, fn in shapes.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name}: min {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
