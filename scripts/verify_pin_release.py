"""Verify (r9, ADVICE r8 low) that `_pin`'s localCheckpoint(eager=True)
blocks are actually released between bench queries by the existing
Python-GC → py4j detach → JVM System.gc() → ContextCleaner chain, since
`spark.catalog.clearCache()` does NOT cover checkpointed RDD blocks.

Runs several ranking-machinery consumers back-to-back the way bench.py
does (no references kept, clearCache + System.gc() between), then polls
getRDDStorageInfo. Success = storage returns to empty, i.e. no
accumulation across a long multi-query session.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.session import (  # noqa: E402
    get_spark,
)


def storage_blocks(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return [(i.id(), i.memSize(), i.numCachedPartitions()) for i in infos]


def main() -> None:
    spark = get_spark(app_name="verify-pin-release")
    from __spark_entry__ import queries

    reg = queries()
    sf = "/root/testdata/sf0.01"
    # grs/grn consumers: every one routes through ranking._pin
    names = [
        n
        for n in (
            "ntile_customers_by_spend",
            "mannwhitney_u_click_view",
            "auc_roc_click_rank",
            "mood_median_test",
        )
        if n in reg
    ]
    print(f"queries: {names}")
    for rounds in range(3):
        for n in names:
            reg[n](spark, sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        during = storage_blocks(spark)
        print(f"round {rounds}: blocks after clearCache only = {len(during)}")
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        for _ in range(20):
            left = storage_blocks(spark)
            if not left:
                break
            time.sleep(0.5)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        print(f"round {rounds}: blocks after gc = {len(left)} {left[:5]}")
    ok = not storage_blocks(spark)
    print(f"RELEASED={ok}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
