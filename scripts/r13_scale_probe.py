"""sf1-equivalent core-scaling probe (VERDICT r12 #9).

The sf0.1 bench's 8c/32c ratios cluster at ~1 because 0.1-10 s queries
are dominated by fixed job/planning overhead — the scaling block
measures the scheduler, not the code. This probe replicates the sf0.1
tables 10× with key offsets (the NOTES.md round-1 recipe: group/key
cardinality scales with the data, FK joins stay consistent because
every replica offsets both sides of each key) into a throwaway
directory, then times the compute-bound query set at two core counts
in SEPARATE sequential JVMs. At ~10× the per-query compute, the ratio
should approach the core ratio on genuinely parallel code.

The replicated directory is a PROBE artifact (written under /tmp,
never read by bench.py or any query path — not a cache).

Usage:
    python scripts/r13_scale_probe.py build          # write /tmp/sfx10
    python scripts/r13_scale_probe.py run <cpus>     # time one arm
Results print as one JSON line per arm; compare externally.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (  # noqa: E402
    get_spark,
)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
N_REP = 10
OFFSET = 1_000_000_000

#: key columns to offset per replica (FK pairs offset together)
_KEY_RE = ("key", "doc_id", "vec_id", "user_id")

#: compute-bound probe set: the 8c/32c ratio >= 1.3 family from
#: BENCH_r12_c8 plus the four scaling-run regression flags
QUERIES = [
    "ngram_jaccard_pairs",
    "tpch_q17_small_quantity_revenue",
    "risk_calc_per_customer",
    "lexical_density_by_source",
    "sprt_purchase_decision",
    "mann_kendall_trend_daily",
    "friedman_event_counts",
    "text_profile",
    "regr_value_vs_time",
    "windowed_topk_batch",
    "bot_regularity_timing",
    "percentiles_exact",
    "approx_aggs",
    "grouped_median_pandas",
    "classifier_auc_exact",
]


def build() -> None:
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        TABLES,
        load_table,
    )

    spark = get_spark(
        app_name="sfx10-build",
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, SRC, t)
        keyish = [
            c
            for c in df.columns
            if any(k in c.lower() for k in _KEY_RE)
            and dict(df.dtypes)[c] in ("bigint", "int")
        ]
        reps = []
        for k in range(N_REP):
            r = df
            for c in keyish:
                r = r.withColumn(c, F.col(c) + F.lit(k * OFFSET))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{t}.parquet"))
        print(f"built {t} ({len(keyish)} key cols offset: {keyish})")
    spark.stop()


def run(cpus: int) -> None:
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    spark = get_spark(
        app_name=f"sfx10-c{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warm pass (codegen/page cache), then min-of-2
    timings = {}
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        try:
            fn(spark, DST).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            timings[name] = f"ERROR: {exc}"
            continue
        spark.catalog.clearCache()
    for name in QUERIES:
        if isinstance(timings.get(name), str):
            continue
        fn, _ = REGISTRY[name]
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, DST).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = min(ts)
    print(json.dumps({"cpus": cpus, "queries": timings}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
