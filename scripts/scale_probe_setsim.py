"""Time-vs-N scale probes for the two remaining ~4 s set-similarity
queries (r9, VERDICT r8 item 4): setsim_prefix_filter_pairs and
sparse_cosine_pairs, over N salted replicas of sf0.1 documents at
N = 1, 4, 10.

Replica design (NOTES.md probe-trap): per-token r{i}x prefixes make the
replicas' shingle vocabularies DISJOINT, so document frequencies are
identical per replica and candidate volume is structurally N× the N=1
volume — no cross-replica pairs can form in either operator (postings
join: no shared shingle; prefix join: no shared prefix token). The
probe additionally measures the sparse-cosine candidate volume
analytically (Σ C(df,2) over df-capped shingles — exactly the postings
self-join's pre-aggregation pair count) to confirm. Shuffle partitions
scale with N (fixed partitions conflate spill with plan cost, the r8
link-prediction lesson).

Usage: python scripts/scale_probe_setsim.py [N ...]   (default 1 4 10)
"""
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.dedup import (
    prefix_filter_near_dups,
    sparse_cosine_pairs,
    word_shingles,
)

SF = "/root/testdata/sf0.1"


def docs_n(spark, n: int):
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = []
    for i in range(n):
        text = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(^|\s)", f"$1r{i}x")
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                text.alias("text"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def sparse_cosine_candidates(d, df_cap: int = 64) -> int:
    """Σ C(df,2) over df-capped shingles == the postings self-join's
    exact pair volume (same shingling as the operator)."""
    ex = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles("text", 3))
        ).alias("sh"),
    )
    return (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .agg(F.sum(F.col("_df") * (F.col("_df") - 1) / 2).alias("c"))
        .collect()[0]
        .c
    )


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1, 4, 10]
    for n in ns:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", str(32 * max(1, n // 2)))
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .appName(f"scale-probe-setsim-n{n}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        d = docs_n(spark, n).localCheckpoint(eager=True)
        cands = int(sparse_cosine_candidates(d))
        for label, fn in (
            ("sparse_cosine", sparse_cosine_pairs),
            ("prefix_filter", prefix_filter_near_dups),
        ):
            times, pairs = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                pairs = fn(d).count()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            extra = f" cands={cands}" if label == "sparse_cosine" else ""
            print(
                f"N={n:2d} {label}: pairs={pairs}{extra} "
                f"times={[round(t, 2) for t in times]} min={min(times):.2f}s",
                flush=True,
            )
        spark.stop()


if __name__ == "__main__":
    main()
