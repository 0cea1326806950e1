"""Time-vs-N scale probes for the r6-session-3 ranking/fold queries:
union N key-offset replicas of sf0.1 and measure wall time at
N = 1, 4, 10 (the VERDICT r5 item-6 recipe, isolated measurements:
clearCache + GC between runs).

Replica design: events get event_id/user_id offsets of i*10M and a
ts shift of i seconds (so distinct sweep boundaries and per-user
keysets both scale N-fold); documents get doc_id offsets (sources stay
at 20 — rank frames grow N-fold, which IS the honest workload growth
for quantile normalization).

Usage: python scripts/scale_probe_session3.py [N ...]  (default 1 4 10)
"""
import gc
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .appName("scale-probe-session3")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
    load_table,
)

SF = "/root/testdata/sf0.1"
OFF = 10_000_000
ev0 = load_table(spark, SF, "events").select(
    "event_id", "user_id", "event_type", "value", "ts"
)
docs0 = load_table(spark, SF, "documents").select(
    "doc_id", "source", "n_chars"
)


def _union(parts):
    return reduce(lambda a, b: a.unionByName(b), parts)


def events_n(n):
    return _union(
        [
            ev0.select(
                (F.col("event_id") + i * OFF).alias("event_id"),
                (F.col("user_id") + i * OFF).alias("user_id"),
                "event_type",
                "value",
                (F.col("ts") + F.expr(f"INTERVAL {i} SECOND")).alias("ts"),
            )
            for i in range(n)
        ]
    )


def docs_n(n):
    return _union(
        [
            docs0.select(
                (F.col("doc_id") + i * OFF).alias("doc_id"),
                "source",
                "n_chars",
            )
            for i in range(n)
        ]
    )


# ---- probe bodies: same plans as the registered queries, inputs swapped


def probe_quantile_normalize(n):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.ranking import (
        global_row_number,
    )

    docs = docs_n(n)
    g = global_row_number(docs, ["n_chars", "doc_id"], rn_col="gpos").select(
        F.col("gpos"), F.col("n_chars").alias("norm_chars")
    )
    sn = global_row_number(docs, ["source", "n_chars", "doc_id"], rn_col="srn_g")
    tot = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(F.broadcast(b), F.col("b.source") < F.col("a.source"), "left")
        .groupBy(F.col("a.source").alias("source"))
        .agg(F.coalesce(F.sum("b.ns"), F.lit(0)).alias("off"),
             F.first("a.ns").alias("ns"))
    )
    s = sn.join(F.broadcast(off), "source").select(
        "doc_id", (F.col("srn_g") - F.col("off")).alias("r"), "ns",
        F.col("_total_n").alias("ng"),
    )
    pos = F.expr("(r * ng + ns - 1) div ns")
    return s.join(g, pos == F.col("gpos")).count()


def probe_active_coverage(n):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.ranking import (
        global_row_number,
        global_running_sum,
    )

    ev = events_n(n).select(F.unix_micros("ts").alias("t"))
    pts = ev.select("t", F.lit(1).alias("dd")).unionByName(
        ev.select((F.col("t") + 600_000_000).alias("t"), F.lit(-1).alias("dd"))
    )
    d = pts.groupBy("t").agg(F.sum("dd").alias("dd"))
    cum = global_running_sum(d, ["t"], "dd", "c").select("t", "c")
    rn = global_row_number(d, ["t"], rn_col="rn").select("t", "rn")
    cur = cum.join(rn, "t")
    nxt = rn.select(F.col("t").alias("nt"), (F.col("rn") - 1).alias("rn"))
    return (
        cur.join(nxt, "rn", "left")
        .agg(F.sum(F.when(F.col("c") > 0, F.col("nt") - F.col("t")).otherwise(0)))
        .collect()
    )


def probe_spearman(n):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.analytics import (
        _doubled_avg_rank,
    )

    ev = events_n(n).filter(F.col("value").isNotNull()).select(
        "event_type", "value", F.unix_micros("ts").alias("us")
    )
    rx = _doubled_avg_rank(ev, "value", "rx2")
    ry = _doubled_avg_rank(ev, "us", "ry2")
    rows = ev.join(rx, ["event_type", "value"]).join(ry, ["event_type", "us"])
    d16 = lambda c: F.col(c).cast("decimal(16,0)")  # noqa: E731
    return rows.groupBy("event_type").agg(
        F.sum(d16("rx2") * d16("ry2")).cast("double")
    ).collect()


def probe_ewma(n):
    ev = events_n(n).select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id", "value"
    )
    arr = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("us", "event_id", "value"))).alias("a")
    )
    ewma = F.aggregate(
        F.col("a"), F.lit(0.0),
        lambda s, x: s / F.lit(2.0) + x["value"] / F.lit(2.0),
    )
    return arr.select(F.sum(ewma)).collect()


PROBES = {
    "quantile_normalize": probe_quantile_normalize,
    "active_coverage": probe_active_coverage,
    "spearman": probe_spearman,
    "ewma_fold": probe_ewma,
}

if __name__ == "__main__":
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for name, fn in PROBES.items():
        for n in ns:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            gc.collect()
            t0 = time.time()
            fn(n)
            print(f"{name} N={n}: {time.time() - t0:.2f}s", flush=True)
