"""Block-key refinement probe (VERDICT r9 §8): candidate-pair counts
for the Fellegi-Sunter linkage at nation-only vs nation+nm2 blocking,
at equal link output (equality certified by the driver oracle of
entity_resolution_refined_blocks). Candidates = what the pair join
materializes = the linkage cost driver (Σ block²)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.analytics import (
    _fs_scored_pairs,
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

for sf in ("sf0.001", "sf0.01", "sf0.1"):
    d = f"/root/testdata/{sf}"
    row = {"sf": sf}
    for tag, refine in (("nation", False), ("nation+nm2", True)):
        t0 = time.time()
        sc = _fs_scored_pairs(spark, d, refine_nm=refine)
        cands = sc.count()
        links = sc.filter(F.col("match_weight") >= 8.0).count()
        row[tag] = (cands, links, round(time.time() - t0, 2))
    n, r = row["nation"], row["nation+nm2"]
    print(
        f"{sf}: nation block = {n[0]:>10} cands / {n[1]} links ({n[2]}s)"
        f" | refined = {r[0]:>8} cands / {r[1]} links ({r[2]}s)"
        f" | cand drop {n[0] / max(r[0], 1):.0f}x, links equal: {n[1] == r[1]}"
    )
