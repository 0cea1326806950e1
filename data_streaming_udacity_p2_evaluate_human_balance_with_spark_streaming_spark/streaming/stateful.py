"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful op is the implicit join state of its
stream-stream join (SURVEY.md §2.8-T6). This module adds the operator
its empty risk-calculation stub implies: a per-customer running risk
aggregate that updates as events arrive — state the built-in windowed
aggregates can't express (running stats over ALL history per key with
custom emission logic).

The batch twin is operators.aggregates.risk_calculation: replaying a
finite stream through this operator converges to the same totals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_score double, avg_score double"
STATE_SCHEMA = "n bigint, total double"


def running_risk_stats(
    events: DataFrame, user_col: str = "user_id", score_col: str = "value"
) -> DataFrame:
    """Continuously-updated per-customer risk stats. Emits one row per
    (key, micro-batch) with the post-batch running aggregate.

    State is two numbers per customer — at 100 TB keyspace this lives
    in the RocksDB state store (see session.py) and scales with
    distinct keys, not events.
    """

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # self-contained: shipped by value, workers don't import this pkg
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf.iloc[:, 1].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_score": [total],
                "avg_score": [total / n if n else 0.0],
            }
        )

    return (
        events.select(user_col, score_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_guard(
    events: DataFrame, key_col: str = "user_id", seq_col: str = "event_id"
) -> DataFrame:
    """Stateful idempotency guard: per key, remember the highest
    sequence id seen and emit only rows with a NEW higher id — the
    at-least-once → effectively-once adapter in front of non-idempotent
    sinks. State is one bigint per key (watermark-less variant of
    dropDuplicates for monotonic sequence ids)."""

    def guard(key, batches, state):
        import pandas as _pd

        high = state.get[0] if state.exists else -1
        out = []
        for pdf in batches:
            pdf = pdf.sort_values(pdf.columns[1])
            fresh = pdf[pdf.iloc[:, 1] > high]
            if len(fresh):
                high = int(fresh.iloc[:, 1].max())
                out.append(fresh)
        state.update((high,))
        yield (
            _pd.concat(out)
            if out
            else _pd.DataFrame({"user_id": [], "event_id": []}).astype("int64")
        )

    return (
        events.select(key_col, seq_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            guard,
            outputStructType=f"{key_col} bigint, {seq_col} bigint",
            stateStructType="high bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
