"""Round-7 profiling, part 2: alternative formulations."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

SF_DIR = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("profile_r7b")
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


def fuzzy_blockgen():
    """One scan, one shuffle: collect block members, generate pairs
    in-block with nested transform, explode, levenshtein post-explode."""
    d0 = docs.select(
        "doc_id",
        "lang",
        F.substring_index("text", " ", 1).alias("w1"),
        F.substring("text", 1, 32).alias("p"),
    )
    blocks = (
        d0.groupBy("lang", "w1")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "p"))).alias("m"))
        .filter((F.size("m") >= 2) & (F.size("m") <= 1000))
    )
    pairs = blocks.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x.doc_id as doc_a, y.doc_id as doc_b, "
                    "x.p as pa, y.p as pb)))"
                )
            )
        ).alias("pr")
    )
    return pairs.select(
        F.col("pr.doc_a"),
        F.col("pr.doc_b"),
        F.levenshtein(F.col("pr.pa"), F.col("pr.pb"), 14).alias("dist"),
    ).filter(F.col("dist") >= 0)


def fuzzy_blockgen_repart():
    d0 = docs.select(
        "doc_id",
        "lang",
        F.substring_index("text", " ", 1).alias("w1"),
        F.substring("text", 1, 32).alias("p"),
    )
    blocks = (
        d0.groupBy("lang", "w1")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "p"))).alias("m"))
        .filter((F.size("m") >= 2) & (F.size("m") <= 1000))
    )
    pairs = blocks.repartition(32).select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x.doc_id as doc_a, y.doc_id as doc_b, "
                    "x.p as pa, y.p as pb)))"
                )
            )
        ).alias("pr")
    )
    return pairs.select(
        F.col("pr.doc_a"),
        F.col("pr.doc_b"),
        F.levenshtein(F.col("pr.pa"), F.col("pr.pb"), 14).alias("dist"),
    ).filter(F.col("dist") >= 0)


def asof_union_window():
    """Fan-out-free as-of: union orders+events on a common timeline per
    user, carry the best (date, orderkey) struct forward, keep events."""
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("string").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct("o_orderdate", "o_orderkey").alias("ok"),
    )
    e = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast(
            "struct<o_orderdate:date,o_orderkey:bigint>"
        ).alias("ok"),
    )
    u = o.unionByName(e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", "ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("best", F.max("ok").over(w))
        .filter((F.col("is_event") == 1) & F.col("best").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.o_orderkey").alias("o_orderkey"),
        )
    )


print("== fuzzy block-gen variants ==")
timeit("fuzzy: blockgen (collect_list + transform)", fuzzy_blockgen)
timeit("fuzzy: blockgen + repartition(32)", fuzzy_blockgen_repart)
print("== asof union-window ==")
timeit("asof: union + running max window", asof_union_window)

# verify equivalence vs current formulations
def fuzzy_current():
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
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.w1") == F.col("b.w1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.p"), F.col("b.p"), 14).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


def asof_current():
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


print("== equivalence checks ==")
fz_new = fuzzy_blockgen().orderBy("doc_a", "doc_b").collect()
fz_old = fuzzy_current().orderBy("doc_a", "doc_b").collect()
print("fuzzy identical:", fz_new == fz_old, len(fz_new), len(fz_old))

as_new = asof_union_window().orderBy("event_id").collect()
as_old = asof_current().orderBy("event_id").collect()
print("asof identical:", as_new == as_old, len(as_new), len(as_old))
if as_new != as_old:
    diffs = [(a, b) for a, b in zip(as_new, as_old) if a != b][:5]
    for d in diffs:
        print(" diff:", d)

spark.stop()
# appended: asof array variant
