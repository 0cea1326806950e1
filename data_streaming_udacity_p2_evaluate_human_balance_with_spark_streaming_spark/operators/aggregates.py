"""Aggregation / window operators.

The reference has ZERO aggregations (SURVEY.md §2.5) but declares two
empty stubs whose filenames promise them:
`/root/reference/project/starter/sparkpyoptionalriskcalculation.py:1-4`
and `sparkpyoptionalriskquality.py:1-4`. These operators fill those
stubs: grouped risk statistics per customer and event-time-windowed
risk quality, usable in both batch and streaming (the streaming twin
adds a watermark so state can evict).

Numeric policy for oracle-comparable outputs: sums/avgs go through
exact DECIMAL arithmetic and are surfaced as DOUBLE
(`CAST(SUM(DECIMAL) AS DOUBLE)`), so cross-engine results are
bit-identical instead of summation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact intermediate for money/score sums
_DEC = "decimal(18,2)"

#: Final decimal type before surfacing as double. Scale 6 is exact for
#: our ≤6dp products, and keeps the unscaled value < 2^53 (sums up to
#: ~9e9), so DECIMAL→DOUBLE is a single correctly-rounded conversion on
#: BOTH engines. At higher scales (e.g. the natural (38,10) of a decimal
#: product chain) DuckDB's int128/10^scale path can differ from Spark's
#: BigDecimal path by 1 ulp — observed on tpch_q1 sum_charge at sf0.01.
_OUT = "decimal(38,6)"


def exact_sum(col: str, alias: str):
    return F.sum(F.col(col).cast(_DEC)).cast(_OUT).cast("double").alias(alias)


def exact_avg(col: str, alias: str):
    """Deterministic avg: exact decimal sum → double, / count."""
    return (
        F.sum(F.col(col).cast(_DEC)).cast(_OUT).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def risk_calculation(events: DataFrame, user_col: str = "user_id", score_col: str = "value") -> DataFrame:
    """Per-customer risk statistics (fills
    sparkpyoptionalriskcalculation.py). Partial aggregation happens
    map-side; the shuffle carries one row per (partition, user)."""
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(score_col, "total_score"),
        exact_avg(score_col, "avg_score"),
        F.min(score_col).alias("min_score"),
        F.max(score_col).alias("max_score"),
    )


def risk_quality_windowed(
    events: DataFrame,
    ts_col: str = "ts",
    score_col: str = "value",
    window: str = "15 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window risk quality (fills
    sparkpyoptionalriskquality.py). Batch twin: no watermark; streaming:
    pass e.g. watermark="30 minutes" so window state closes."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(ts_col, window)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(score_col, "total_score"),
            exact_avg(score_col, "avg_score"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_score", "avg_score")
    )


def hll_sketch_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches, built into
    Spark SQL): one binary sketch per group. Sketches union across
    groups/partitions/days without rescanning data — THE pattern for
    incremental distinct-counting over 100 TB (store sketches, not
    ids)."""
    return df.groupBy(group_col).agg(
        F.expr(f"hll_sketch_agg({value_col})").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_union_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union per-group sketches into one global distinct estimate —
    merges tiny binary blobs, never the raw data."""
    return sketches.agg(
        F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))").alias(
            "distinct_estimate"
        )
    )


def top_k_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str
) -> DataFrame:
    """Top-K per group via ranking window — single shuffle on the group
    key; deterministic via the tiebreak column."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumnRenamed("rnk", "rank")
    )


def psi_from_period_counts(pv: DataFrame) -> DataFrame:
    """Population-Stability-Index finalize over an ADDITIVE count
    table (is_ref boolean, c bigint, cnt bigint) — the shared tail of
    the `psi_value_drift` batch query and its streaming twin (r11
    VERDICT #6): because the state is pure per-(period, cents) counts,
    any micro-batch decomposition that sums `cnt` by key (e.g. the
    additive_merge_parquet sink) finalizes to EXACTLY the batch
    answer — finalize == batch is an algebraic identity, pinned by
    tests/test_streaming.py.

    Bin edges are the reference period's exact deciles (rank
    ceil(q·n/10) via a running sum over distinct cents — note DIV, not
    `/`: Spark's Column `/` is true division); both periods bin by
    count-of-edges-below; +1 Laplace smoothing keeps the log defined
    on empty current bins; each bin's term is ONE shared IEEE tree on
    exact integers floored to 1e9 fixed point before the 10-term sum.

    Returns (bin, ref_cnt, cur_cnt, term_fp, psi, stable_lt_01)."""
    from pyspark.sql.window import Window

    spark = pv.sparkSession
    rv = pv.filter("is_ref").select("c", "cnt")
    cv = pv.filter("NOT is_ref").select("c", "cnt")
    rn = rv.agg(F.sum("cnt").alias("n_ref"))
    cn = cv.agg(F.sum("cnt").alias("n_cur"))
    rcum = rv.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qs = spark.range(1, 10).select(F.col("id").alias("q"))
    edges = (
        rcum.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(rn))
        .filter(F.col("cum") >= F.expr("(q * n_ref + 9) DIV 10"))
        .groupBy("q")
        .agg(F.min("c").alias("edge"))
    )

    def _bin_of_c(vals):
        return (
            vals.crossJoin(F.broadcast(edges.select("edge")))
            .groupBy("c", "cnt")
            .agg(
                F.sum(F.when(F.col("c") > F.col("edge"), 1).otherwise(0))
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.sum("cnt").alias("cnt"))
        )

    a = _bin_of_c(rv)
    b = _bin_of_c(cv)
    spine = spark.range(0, 10).select(F.col("id").alias("bin"))
    cells = (
        spine.join(a.withColumnRenamed("cnt", "ref_cnt"), "bin", "left")
        .join(b.withColumnRenamed("cnt", "cur_cnt"), "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
        )
    )
    terms = (
        cells.crossJoin(F.broadcast(rn))
        .crossJoin(F.broadcast(cn))
        .select(
            "bin",
            "ref_cnt",
            "cur_cnt",
            F.expr(
                "CAST(floor(1000000000.0 * ("
                "(CAST(ref_cnt + 1 AS DOUBLE) / (n_ref + 10)"
                " - CAST(cur_cnt + 1 AS DOUBLE) / (n_cur + 10))"
                " * ln(CAST((ref_cnt + 1) * (n_cur + 10) AS DOUBLE)"
                " / CAST((cur_cnt + 1) * (n_ref + 10) AS DOUBLE))"
                ")) AS BIGINT)"
            ).alias("term_fp"),
        )
        .localCheckpoint()
    )
    tot = terms.agg(F.sum("term_fp").alias("psi_fp"))
    return terms.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        "term_fp",
        F.round(
            F.col("psi_fp").cast("double") / 1_000_000_000.0, 6
        ).alias("psi"),
        (F.col("psi_fp") < 100_000_000).alias("stable_lt_01"),
    )
