"""Empirical time-vs-N scale probes for the three heaviest iterative /
similarity families (VERDICT r5 item 6): union N key-offset replicas of
sf0.1 and measure wall time at N = 1, 4, 10.

Replica design (NOTES.md probe-trap): documents are salted PER TOKEN
(prefix every token with r{i}x) so cross-replica similarity is exactly
zero — true near-dup pairs scale N×, never replica-pair cross products.
Graph inputs shift both key columns by i·10M so the co-purchase graph
is N disjoint copies.

Usage: python scripts/scale_probe_heavy.py [N ...]   (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
    connected_components_jump,
    minhash_near_dups,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
    pagerank_integer,
)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .appName("scale-probe-heavy")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.1"
OFF = 10_000_000
docs0 = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
li0 = spark.read.parquet(f"{SF}/lineitem.parquet").select(
    "l_orderkey", "l_partkey"
)


def _union(parts):
    return reduce(lambda a, b: a.unionByName(b), parts)


def docs_n(n: int):
    parts = []
    for i in range(n):
        text = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(^|\s)", f"$1r{i}x")
        )
        parts.append(
            docs0.select(
                (F.col("doc_id") + i * OFF).alias("doc_id"),
                text.alias("text"),
            )
        )
    return _union(parts)


def li_n(n: int):
    return _union(
        li0.select(
            (F.col("l_orderkey") + i * OFF).alias("l_orderkey"),
            (F.col("l_partkey") + i * OFF).alias("l_partkey"),
        )
        for i in range(n)
    )


def probe_minhash(n: int):
    return minhash_near_dups(docs_n(n), threshold=0.5).count()


def probe_cc_jump(n: int):
    pairs = minhash_near_dups(docs_n(n), threshold=0.5)
    return connected_components_jump(pairs).count()


def probe_pagerank(n: int):
    li = (
        li_n(n)
        .filter(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .distinct()
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    ranks = pagerank_integer(e, iterations=10)
    w = Window.orderBy(F.desc("r"), F.asc("node"))
    return (
        ranks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .count()
    )


PROBES = {
    "dedup_minhash_lsh": probe_minhash,
    "dedup_cluster_pointer_jumping": probe_cc_jump,
    "pagerank_parts_copurchase": probe_pagerank,
}

# r6 additions: the two new iterative graph ops (frontier BFS, LPA).
# Disjoint replica copies — per-copy work should scale ~linearly in N.
def _graph_n(n: int):
    li = (
        li_n(n)
        .filter(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .distinct()
    )
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )


def probe_bfs(n: int):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        bfs_hops,
    )

    e = _graph_n(n)
    nodes = (
        e.select(F.col("pa").alias("n"))
        .unionByName(e.select(F.col("pb").alias("n")))
        .distinct()
    )
    seeds = nodes.filter(
        F.substring(F.md5(F.col("n").cast("string")), 3, 1) == "0"
    )
    return bfs_hops(e, seeds, max_hops=3).count()


def probe_lpa(n: int):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
        label_propagation,
    )

    return label_propagation(_graph_n(n), rounds=4).count()


PROBES["bfs_hops_copurchase"] = probe_bfs
PROBES["lpa_communities_copurchase"] = probe_lpa

# r6 continuation: the exact similarity joins (the remaining top-cost
# family). Token-salted replicas → zero cross-replica similarity; true
# pairs scale N×.
def probe_setsim(n: int):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        prefix_filter_near_dups,
    )

    return prefix_filter_near_dups(docs_n(n)).count()


def probe_sparse_cosine(n: int):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(docs_n(n)).count()


PROBES["setsim_prefix_filter_pairs"] = probe_setsim
PROBES["sparse_cosine_pairs"] = probe_sparse_cosine


# r6 continuation 2: link prediction — the wedge join is Σ deg(z)² and
# the family's quadratic risk; disjoint replicas keep per-copy degree
# fixed, so the probe isolates scheduling/shuffle growth from wedge
# blow-up (which would show superlinear immediately).
def probe_linkpred(n: int):
    e = _graph_n(n)
    sym = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    wedge = (
        sym.alias("s1")
        .join(sym.alias("s2"), F.col("s1.v") == F.col("s2.u"))
        .filter(F.col("s1.u") < F.col("s2.v"))
        .select(
            F.col("s1.u").alias("a"),
            F.col("s2.v").alias("b"),
            F.col("s1.v").alias("z"),
        )
    )
    cand = (
        wedge.join(deg.withColumnRenamed("u", "z"), "z")
        .groupBy("a", "b")
        .agg(
            F.sum(F.expr("1000000000000L div d")).cast("long").alias("ra_fp")
        )
    )
    nonedge = cand.join(
        e,
        (F.col("a") == F.col("pa")) & (F.col("b") == F.col("pb")),
        "left_anti",
    )
    return nonedge.count()


PROBES["link_prediction_scores"] = probe_linkpred

ns = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
# optional single-family run: PROBE_ONLY=link_prediction_scores
_only = __import__("os").environ.get("PROBE_ONLY")
if _only:
    PROBES = {_only: PROBES[_only]}
# warm the JVM/codegen once so N=1 isn't charged the session cold-start
probe_minhash(1)
for name, fn in PROBES.items():
    for n in ns:
        # isolate measurements: free cached/checkpointed blocks from the
        # previous call and let ContextCleaner catch up — repeated heavy
        # calls in one JVM otherwise accumulate storage + GC pressure
        # that swings single-shot timings 2-8x (measured on setsim N=7:
        # 14 s and 115 s for the IDENTICAL call in one session)
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.monotonic()
        out = fn(n)
        dt = time.monotonic() - t0
        print(f"{name} N={n} out_rows={out} sec={dt:.2f}", flush=True)
