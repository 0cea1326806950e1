"""N=1/4/10 scale probe for the r10 iterative graph operators
(hits_integer_bipartite, personalized_pagerank_integer).

Replica design: N DISJOINT copies of the sampled sf0.1 co-purchase /
order-part graph (node ids offset by 1e9·i), so edges, nodes, and all
per-round join/agg work are structurally exactly N× — any superlinear
wall growth is plan overhead, not graph math. PPR seeds in the FIRST
copy only (its walk never leaves that copy — rounds touch N× edges but
mass stays put, the honest worst case for the join). Shuffle
partitions scale with N.
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
    hits_integer_bipartite,
    personalized_pagerank_integer,
)

SF = "/root/testdata/sf0.1"


def graph_n(spark, n: int):
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(
            F.substring(
                F.md5(F.col("l_partkey").cast("string")), 1, 1
            ).isin("0", "1", "2", "3")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    reps = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 1_000_000_000)).alias("o"),
            (F.col("l_partkey") + F.lit(i * 1_000_000_000)).alias("p"),
        )
        for i in range(n)
    ]
    return reduce(lambda a, b: a.unionByName(b), reps).localCheckpoint()


def main():
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", str(8 * n))
            .config("spark.ui.enabled", "false")
            .appName(f"graphs-probe-{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        bip = graph_n(spark, n)
        edges = bip.count()
        t0 = time.time()
        hits_integer_bipartite(bip, iterations=8).count()
        th = time.time() - t0
        cp = (
            bip.alias("a")
            .join(
                bip.alias("b"),
                (F.col("a.o") == F.col("b.o"))
                & (F.col("a.p") < F.col("b.p")),
            )
            .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
            .distinct()
            .localCheckpoint()
        )
        ce = cp.count()
        t0 = time.time()
        personalized_pagerank_integer(cp, iterations=10).count()
        tp = time.time() - t0
        print(
            f"N={n}: bip_edges={edges} hits={th:.1f}s | "
            f"copurchase_edges={ce} ppr={tp:.1f}s"
        )
        spark.stop()


main()
