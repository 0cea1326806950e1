"""In-memory fixture sources for tests.

Replaces the reference's manual probe workflow (`zadd Customer ...` then
watch a console consumer, `/root/reference/project/starter/README.md:44-57`)
with deterministic replay: a list of payload dicts becomes either a batch
DataFrame or a file-backed streaming DataFrame driven by
Trigger.AvailableNow.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def batch_from_rows(
    spark: SparkSession, rows: list[dict], schema: StructType
) -> DataFrame:
    return spark.createDataFrame(rows, schema)


def json_lines_dir(rows: list[dict]) -> str:
    """Write rows as one JSON-lines file in a temp dir (a file-source
    streaming DataFrame needs a directory)."""
    d = os.path.join(tempfile.gettempdir(), f"stedi-fixture-{uuid.uuid4().hex}")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return d


def stream_from_rows(
    spark: SparkSession, rows: list[dict], schema: StructType
) -> DataFrame:
    """Streaming DataFrame replaying `rows` once (pair with
    Trigger.AvailableNow to process-all-then-stop)."""
    d = json_lines_dir(rows)
    return spark.readStream.format("json").schema(schema).load(d)
