"""Round-7 profiling: root-cause fuzzy_prefix_pairs and
asof_latest_order_before_event regressions on a quiet box.

Runs variants isolated (clearCache between passes), min-of-3, sf0.1.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF_DIR = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("profile_r7")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def timeit(name, fn, passes=3):
    best = float("inf")
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn().count()
        dt = time.time() - t0
        best = min(best, dt)
    print(f"{name:55s} {best:7.3f}s  rows={n}")
    return best


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id", "user_id", "ts")
orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
    "o_custkey", "o_orderkey", "o_orderdate"
)


def fuzzy_base(lev):
    d0 = docs.select(
        "doc_id",
        "lang",
        F.substring_index("text", " ", 1).alias("w1"),
        F.substring("text", 1, 32).alias("p"),
    )
    ok = (
        d0.groupBy("lang", "w1")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= 1000)
        .drop("_n")
    )
    d = d0.join(ok, ["lang", "w1"])
    a, b = d.alias("a"), d.alias("b")
    j = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.w1") == F.col("b.w1"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if lev == "bounded":
        return j.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.p"), F.col("b.p"), 14).alias("dist"),
        ).filter(F.col("dist") >= 0)
    if lev == "unbounded":
        return j.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.p"), F.col("b.p")).alias("dist"),
        ).filter(F.col("dist") <= 14)
    if lev == "none":
        return j.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.length(F.col("a.p")).alias("dist"),
        )


print("== candidate pair volume ==")
timeit("fuzzy: join only, no levenshtein", lambda: fuzzy_base("none"), passes=2)
print("== levenshtein variants ==")
timeit("fuzzy: levenshtein(a,b,14) bounded", lambda: fuzzy_base("bounded"))
timeit("fuzzy: levenshtein(a,b) unbounded", lambda: fuzzy_base("unbounded"))


def asof_agg():
    joined = ev.join(
        orders,
        (F.col("o_custkey") == F.col("user_id"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )
    return joined.groupBy("event_id").agg(
        F.first("user_id").alias("user_id"),
        F.first("ts").alias("ts"),
        F.max(F.struct("o_orderdate", "o_orderkey")).getField("o_orderkey").alias(
            "o_orderkey"
        ),
    )


def asof_join_only():
    return ev.join(
        orders,
        (F.col("o_custkey") == F.col("user_id"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )


def asof_pre_agg():
    # pre-reduce orders per (custkey, date): only the max orderkey per
    # day can ever win -> shrinks fan-out before the range join
    o2 = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    joined = ev.join(
        o2,
        (F.col("o_custkey") == F.col("user_id"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )
    return joined.groupBy("event_id").agg(
        F.first("user_id").alias("user_id"),
        F.first("ts").alias("ts"),
        F.max(F.struct("o_orderdate", "o_orderkey")).getField("o_orderkey").alias(
            "o_orderkey"
        ),
    )


print("== asof variants ==")
timeit("asof: join only (fan-out volume)", lambda: asof_join_only(), passes=2)
timeit("asof: current (join + max-struct agg)", lambda: asof_agg())
timeit("asof: pre-agg orders per (cust,date)", lambda: asof_pre_agg())

spark.stop()
