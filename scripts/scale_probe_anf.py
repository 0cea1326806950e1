"""N=1/4/10 scale probe for anf_hop_histogram's register propagation
(VERDICT r10 #6 follow-through).

Replica design: replica i relabels every part id by +i·1e9, producing
N DISJOINT copies of the co-purchase slice — nodes, edges, and every
hop ball scale exactly N×. The per-hop work of anf_hop_registers is
one edges ⋈ registers join (≤ 16 register rows per node) plus one
(node, bucket) max aggregate, so candidates AND wall should scale
~linearly in N — the contrast is the exact hop-set materialization,
whose Σ|B(v,h)| is quadratic on a small-world component.

Usage: python scripts/scale_probe_anf.py [N ...]  (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.graphs import (
    anf_hop_registers,
)

SF = "/root/testdata/sf0.1"
HOPS = 4


def edges_n(spark, n: int):
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
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .distinct()
    )
    reps = [
        e.select(
            (F.col("pa") + F.lit(i * 1_000_000_000)).alias("pa"),
            (F.col("pb") + F.lit(i * 1_000_000_000)).alias("pb"),
        )
        for i in range(n)
    ]
    return reduce(lambda a, b: a.unionByName(b), reps)


def main():
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", str(8 * n))
            .config("spark.ui.enabled", "false")
            .appName(f"anf-probe-{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        e = edges_n(spark, n).localCheckpoint()
        n_edges = e.count()
        t0 = time.time()
        regs = anf_hop_registers(e, HOPS)
        n_regs = regs.count()
        wall = time.time() - t0
        print(
            f"N={n}: edges={n_edges} register_rows={n_regs} "
            f"wall={wall:.1f}s"
        )
        spark.stop()


main()
