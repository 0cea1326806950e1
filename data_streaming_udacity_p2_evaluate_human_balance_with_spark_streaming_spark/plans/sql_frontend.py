"""SQL front door: run arbitrary SQL over the engine's catalog.

The reference mixes temp views + spark.sql inside its scripts
(SURVEY.md §2.7); this exposes that idiom as the engine's ad-hoc
interface — register the synthetic tables once, then any ANSI-ish
Spark SQL works, including the fidelity decode idioms
(case-insensitive `zsetEntries[0]`, `unbase64`, `from_json`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.files import register_views


class SqlFrontend:
    """Tiny session wrapper: `SqlFrontend(spark, sf_dir).sql(...)`."""

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self.spark = spark
        register_views(spark, sf_dir)

    def sql(self, statement: str) -> DataFrame:
        return self.spark.sql(statement)

    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
