"""Join operators (SURVEY.md §2.4 J1 + the join surface the reference
gets for free from Spark).

The reference's single join is a watermark-less stream-stream inner
equi-join (`sparkpykafkajoin.py:131`:
``emailAndBirthYearStreamingDF.join(customerRiskStreamingDF,
expr("email=customer"))``) — state grows unboundedly (SURVEY.md
§2.8-T4). We keep that as fidelity mode and add the watermarked variant
as the 100 TB-safe mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, condition: str, how: str = "inner") -> DataFrame:
    """J1: theta-expressed equi-join; Catalyst's ExtractEquiJoinKeys
    turns `expr("email=customer")` into hash-joinable keys."""
    return left.join(right, F.expr(condition), how)


def broadcast_join(
    big: DataFrame, small: DataFrame, condition: str, how: str = "inner"
) -> DataFrame:
    """Scale path for dimension joins: broadcast the small side so the
    big side never shuffles. AQE will also auto-pick broadcast below
    `spark.sql.autoBroadcastJoinThreshold`; the explicit hint makes the
    intent (and plan) deterministic."""
    return big.join(F.broadcast(small), F.expr(condition), how)


def watermarked_stream_join(
    left: DataFrame,
    right: DataFrame,
    condition: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    range_cond: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Scale-safe variant of J1: watermark both sides so the symmetric
    hash-join state store can evict. `range_cond` (e.g.
    "left_ts BETWEEN right_ts - INTERVAL 1 HOUR AND right_ts") bounds
    how long a row stays joinable; without it inner-join state still
    grows for the un-watermarked key dimension."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = condition if range_cond is None else f"({condition}) AND ({range_cond})"
    return lw.join(rw, F.expr(cond), how)
