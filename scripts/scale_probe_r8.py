"""r8 probe (VERDICT r7 item 5): link-prediction AFTER the K=48
super-hub cap —
  (a) time-vs-N on disjoint graph replicas of sf0.1 (N = 1, 4, 10;
      the scale_probe_heavy.py recipe: both key columns shifted by
      i*10M so the co-purchase graph is N disjoint copies), and
  (b) the recall the cap costs: top-20 (ranked by the fixed-point
      resource-allocation key, exactly as the registered query) with
      cap=48 vs UNCAPPED, on the real sf0.1 graph and on a planted-hub
      graph where one center's degree (400) dwarfs the cap.

The scoring body mirrors plans/simjoin.py q_link_prediction_scores
(wedge from the symmetric edge list, center-degree filter, fixed-point
RA sum, anti-join on existing edges, orderBy().limit(20)).

Usage: python scripts/scale_probe_r8.py [N ...]   (default 1 4 10)
"""
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
    .appName("scale-probe-r8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.1"
OFF = 10_000_000
li0 = spark.read.parquet(f"{SF}/lineitem.parquet").select(
    "l_orderkey", "l_partkey"
)


def _union(parts):
    return reduce(lambda a, b: a.unionByName(b), parts)


def li_n(n: int):
    return _union(
        [
            li0.select(
                (F.col("l_orderkey") + F.lit(i * OFF)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(i * OFF)).alias("l_partkey"),
            )
            for i in range(n)
        ]
    )


def lp_top20(li, cap):
    """plans/simjoin.py q_link_prediction_scores core, cap parameterized
    (cap=None -> uncapped). Returns the top-20 DataFrame."""
    lif = li.filter(
        F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    ).select("l_orderkey", "l_partkey").distinct()
    e = (
        lif.alias("a")
        .join(
            lif.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    return lp_top20_from_edges(e, cap)


def lp_top20_from_edges(e, cap):
    sym = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    okz = deg
    if cap is not None:
        okz = deg.filter(F.col("d") <= cap)
    okz = okz.select(F.col("u").alias("z"), F.col("d").alias("dz"))
    wedge = (
        sym.alias("s1")
        .join(okz, F.col("s1.v") == F.col("z"))
        .join(sym.alias("s2"), F.col("s1.v") == F.col("s2.u"))
        .filter(F.col("s1.u") < F.col("s2.v"))
        .select(F.col("s1.u").alias("a"), F.col("s2.v").alias("b"), F.col("dz"))
    )
    cand = wedge.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(F.expr("1000000000000L div dz")).cast("long").alias("ra_fp"),
    )
    nonedge = cand.join(
        e,
        (F.col("a") == F.col("pa")) & (F.col("b") == F.col("pb")),
        "left_anti",
    )
    return nonedge.orderBy(
        F.desc("ra_fp"), F.desc("common_neighbors"), "a", "b"
    ).limit(20)


def timeit(name, fn, passes=3):
    best = float("inf")
    n = 0
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn().count()
        best = min(best, time.time() - t0)
    print(f"{name:48s} {best:7.3f}s  rows={n}", flush=True)
    return best


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 10]

    print("== (a) link-prediction time-vs-N, cap=48 ==")
    for n in ns:
        timeit(f"link_prediction N={n}", lambda n=n: lp_top20(li_n(n), 48),
               passes=3 if n == 1 else 2)

    print("== (b) capped-vs-uncapped recall@20 ==")

    def recall(e_or_li, from_edges=False):
        f = lp_top20_from_edges if from_edges else lp_top20
        capped = {(r.a if from_edges else r["a"], r["b"])
                  for r in f(e_or_li, 48).collect()}
        full = {(r["a"], r["b"]) for r in f(e_or_li, None).collect()}
        inter = len(capped & full)
        print(f"  |capped ∩ uncapped| = {inter}/20  "
              f"(capped-only={len(capped - full)})", flush=True)
        return inter

    print("real sf0.1 graph:")
    recall(li0)

    # planted hub: a 400-degree center z (deg >> 48) plus 60 honest
    # low-degree wedge centers. The hub's wedges all score 1e12/400
    # per term; honest centers contribute 1e12/4 per term -> the true
    # top-20 should be dominated by honest wedges, so the cap should
    # cost little recall DESPITE dropping the hub entirely.
    hub_edges = [(0, 100 + i) for i in range(400)]  # star on z=0
    honest = []
    for c in range(1, 61):  # centers 1..60, deg 4 each
        for j in range(4):
            honest.append((c, 1000 + 3 * c + j))
    rows = [(min(a, b), max(a, b)) for a, b in hub_edges + honest]
    e = spark.createDataFrame(sorted(set(rows)), "pa long, pb long")
    print("planted-hub graph (hub deg 400, 60 honest deg-4 centers):")
    recall(e, from_edges=True)
