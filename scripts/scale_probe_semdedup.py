"""N=1/4/10 scale probe for dedup_semantic_embedding (VERDICT r9 §4).

Replica design: replica i is a CYCLIC DIM SHIFT of the embeddings (same
norms, decorrelated directions — measured natural max cosine ≈ 0.46,
far under the 0.9 threshold), so replicas add corpus without adding
cross-replica near-dups; planted jittered copies (+1e7/+2e7) dup within
every replica. The cell count SCALES WITH N (n_planes = 4 + log2-ish),
the 100 TB lever the operator docstring names: per-cell size stays
~constant, so candidate pairs (Σ C(cell,2)) and wall should stay ~linear
instead of the N² a fixed 16-cell grid would give.

Usage: python scripts/scale_probe_semdedup.py [N ...]  (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
    semantic_dedup,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.functions.vectors import (
    hyperplane_bucket,
)

SF = "/root/testdata/sf0.1"
PLANES = {1: 4, 4: 6, 10: 8}


def corpus_n(spark, n: int):
    base = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    reps = []
    for i in range(n):
        shifted = (
            F.col("v")
            if i == 0
            else F.expr(
                f"concat(slice(v, {i + 1}, size(v) - {i}), slice(v, 1, {i}))"
            )
        )
        reps.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 100_000_000)).alias("vec_id"),
                shifted.alias("v"),
            )
        )
    rep = reduce(lambda a, b: a.unionByName(b), reps)
    jit = F.expr(
        "concat(array(v[0] + 0.001 * (CAST(vec_id % 5 AS DOUBLE) - 2.0D)), "
        "slice(v, 2, size(v) - 1))"
    )
    planted = rep.filter(F.col("vec_id") % 9 == 4).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), jit.alias("v")
    )
    return rep.unionByName(planted)


def main():
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", str(8 * n))
            .config("spark.ui.enabled", "false")
            .appName(f"semdedup-probe-{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        planes = PLANES.get(n, 4)
        c = corpus_n(spark, n).localCheckpoint()
        rows = c.count()
        cands = (
            c.withColumn("cell", hyperplane_bucket("v", planes, n_dims=64))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("s"))
            .agg(F.sum(F.expr("s * (s - 1) / 2")).alias("p"))
            .collect()[0]["p"]
        )
        t0 = time.time()
        out = semantic_dedup(c, n_planes=planes, threshold_milli=900)
        dropped = out.filter(~F.col("kept")).count()
        wall = time.time() - t0
        print(
            f"N={n}: rows={rows} planes={planes} cells=2^{planes} "
            f"candidates={int(cands)} dropped={dropped} wall={wall:.1f}s"
        )
        spark.stop()


main()
