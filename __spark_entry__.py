"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the engine package's registry
(``data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries``);
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans import (
    queries as _q,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.1: envelope decode → join) on
    /root/testdata/sf0.001."""
    return _q.q_flagship_stedi_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get a rows-only check."""
    return _q.all_oracles()
