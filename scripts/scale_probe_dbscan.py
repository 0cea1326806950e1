"""N=1/4/10 scale probe for dbscan_embeddings (VERDICT r10 weak item).

Replica design: replica i shifts dim 0 by +2.0*i (2000 code units =
20 grid cells), so replicas are DISJOINT in ε-space — no cross-replica
pairs are possible, density per cell is constant, and the true pair
count is exactly N× the single-replica count. A quadratic candidate
stage (the old crossJoin) would show candidates ∝ N²; the r11 ε-grid
cell equi-join must show candidates ∝ N (sub-quadratic) and ~linear
wall.

Each replica reproduces the registered query's corpus: every 4th
vector sampled, 3 jittered copies planted on every 12th.

Usage: python scripts/scale_probe_dbscan.py [N ...]  (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.stats_r10 import (
    _DBSCAN_MINPTS,
    _dbscan_candidate_pairs,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
    connected_components,
)

SF = "/root/testdata/sf0.1"


def corpus_n(spark, n: int):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    copies = (
        base.filter(F.col("vec_id") % 12 == 0)
        .withColumn("c", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        .select(
            (F.col("vec_id") + 10_000_000 * F.col("c")).alias("vec_id"),
            F.expr(
                "concat(array(v[0] + 0.002 * c), slice(v, 2, size(v) - 1))"
            ).alias("v"),
        )
    )
    one = base.unionByName(copies)
    reps = [
        one.select(
            (F.col("vec_id") + F.lit(i * 1_000_000_000)).alias("vec_id"),
            F.expr(f"concat(array(v[0] + 2.0D * {i}), slice(v, 2, size(v) - 1))").alias(
                "v"
            ),
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
            .appName(f"dbscan-probe-{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        q = (
            corpus_n(spark, n)
            .select(
                "vec_id",
                F.expr(
                    "transform(v, x -> CAST(floor(x * 1000) AS BIGINT))"
                ).alias("qv"),
            )
            .localCheckpoint()
        )
        rows = q.count()
        t0 = time.time()
        pairs = _dbscan_candidate_pairs(q).localCheckpoint()
        n_pairs = pairs.count()
        nbr = pairs.select(
            F.col("ia").alias("p"), F.col("ib").alias("o")
        ).unionByName(
            pairs.select(F.col("ib").alias("p"), F.col("ia").alias("o"))
        )
        core = (
            nbr.groupBy("p")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") + 1 >= _DBSCAN_MINPTS)
            .select("p")
        )
        ce = pairs.join(core.select(F.col("p").alias("ia")), "ia").join(
            core.select(F.col("p").alias("ib")), "ib"
        )
        n_clusters = (
            connected_components(ce, a_col="ia", b_col="ib")
            .select("cluster")
            .distinct()
            .count()
        )
        wall = time.time() - t0
        print(
            f"N={n}: rows={rows} eps_pairs={n_pairs} "
            f"clusters={n_clusters} wall={wall:.1f}s"
        )
        spark.stop()


main()
