"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the fact-fact join (orders ⋈ lineitem) dominates shuffle
volume. Bucketing both tables by the join key at WRITE time moves that
shuffle offline: every subsequent join on the key is exchange-free
(SortMergeJoin reads co-located buckets directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, condition: str
) -> DataFrame:
    """Join two tables bucketed on their join keys — planner elides
    both exchanges (verify: no `Exchange` in the physical plan)."""
    from pyspark.sql import functions as F

    return spark.table(left_table).join(spark.table(right_table), F.expr(condition))
