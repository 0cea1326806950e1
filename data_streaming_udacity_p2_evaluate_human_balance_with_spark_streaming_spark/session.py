"""SparkSession factory.

The reference builds a bare session per script
(``/root/reference/project/starter/sparkpykafkajoin.py:33``,
``sparkpyrediskafkastreamtoconsole.py:28``) and relies on stock Spark
3.0.0 defaults. We centralize session construction and set the knobs
that matter at scale:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- shuffle partitions sized to the local core count for tests; on a real
  cluster AQE's coalescing makes the initial number far less sensitive
- UTC session timezone so results are comparable with the DuckDB oracle
- case-insensitive resolution preserved (the reference depends on it:
  ``zSetEntries`` declared vs ``zsetEntries`` referenced,
  ``sparkpykafkajoin.py:13,79``)
- Arrow enabled for the Pandas-UDF slow path (vectorized transfer)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "stedi-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Parameters mirror the reference's config surface (SURVEY.md §2.9 C1-C4)
    but everything hardcoded there (broker, master, worker size) is a knob.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.caseSensitive", "false")
        # streaming state at scale: RocksDB keeps join/agg state off-heap
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # the synthetic events table stores ts as TIMESTAMP(NANOS); Spark
        # has no nanos type — read as long, normalized in sources.files
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
