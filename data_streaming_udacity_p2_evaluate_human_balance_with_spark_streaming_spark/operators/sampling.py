"""Deterministic sampling operators for training-data mixtures.

Training corpora are MIXED, not dumped: dominant sources/languages get
downsampled and rare ones kept, per a rates table (the "temperature"
of the mixture). The sampling here is a pure function of the row id —
`md5(id)` hex-prefix compared against a per-group threshold — so it is
reproducible across runs, machines, partitionings, and retries, and
every engine that can md5 a string can verify it (the DuckDB oracle
does exactly that). Contrast `df.sample()`: seeded per-partition RNG,
resample on every layout change, unverifiable.

Scale shape: the rates table broadcasts (it's a handful of rows); the
corpus side is a narrow filter — no shuffle at all. No sampling exists
in the reference; north-star extension alongside
`hash_sample_10pct` / `stratified_split_counts` in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 8 hex chars of md5 = 32 uniform bits; thresholds live in the same space
_PREFIX_LEN = 8
_SPACE = 16**_PREFIX_LEN


def rate_threshold(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the md5-prefix threshold string.
    Lexicographic comparison of fixed-width lowercase hex equals
    numeric comparison; rate >= 1.0 maps to "g" (sorts after every hex
    digit → keep all)."""
    if rate >= 1.0:
        return "g"
    return f"{max(int(rate * _SPACE), 0):0{_PREFIX_LEN}x}"


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff md5(id) hex-prefix < its group's threshold.
    Groups absent from `rates` are DROPPED (inner join against the
    broadcast rates table) — a mixture spec is a whitelist. Realized
    per-group fractions converge to the rates at corpus scale (32-bit
    hash space)."""
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(g, rate_threshold(r)) for g, r in rates.items()],
        f"{group_col} string, _thr string",
    )
    return (
        df.join(F.broadcast(rates_df), group_col, "inner")
        .filter(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, _PREFIX_LEN)
            < F.col("_thr")
        )
        .drop("_thr")
    )


def mixture_resample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Mixture sampling WITH upsampling: rate 2.3 emits every row of
    the group twice plus a deterministic 30% of rows a third time
    (n_copies = floor(rate) + [md5-prefix < frac-threshold]); rates
    below 1 downsample exactly like `mixture_sample`. Output carries
    `epoch_col` (0-based copy index) so downstream shuffling can
    spread repeats across training batches. Still a pure function of
    the row id — explode of a per-row sequence, zero shuffles, rates
    broadcast."""
    spark = df.sparkSession
    rows = []
    for g, r in rates.items():
        whole, frac = int(r), r - int(r)
        rows.append((g, whole, rate_threshold(frac)))
    rates_df = spark.createDataFrame(
        rows, f"{group_col} string, _whole int, _fthr string"
    )
    n_copies = F.col("_whole") + F.when(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _PREFIX_LEN)
        < F.col("_fthr"),
        1,
    ).otherwise(0)
    return (
        df.join(F.broadcast(rates_df), group_col, "inner")
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(epoch_col, F.explode(F.expr("sequence(0, _n - 1)")))
        .drop("_whole", "_fthr", "_n")
    )


def systematic_pps_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size (PPS) sampling:
    draw exactly `k` picks where each row's inclusion count is
    proportional to its integer weight (token/char budget sampling for
    training mixtures — big documents proportionally more likely, with
    the classic variance-free systematic grid rather than independent
    draws).

    Construction: lay the rows on a line in a deterministic pseudo-
    random order (md5(id), id — reshuffle-proof, partition-independent),
    each occupying an interval of length = its weight × k (the ×k
    rescale makes the grid step EXACTLY the raw total — no fractional
    step, no remainder drift); place k grid points at offset total/2,
    spaced total apart; a row is picked once per grid point inside its
    interval (a row wider than the step can be picked twice — that's
    PPS semantics, multiplicity reported in `n_picks`). Exactly k picks
    total, always: the j-th point lands at total DIV 2 + j·total for
    j = 0..k−1, all inside (0, k·total].

    Why not Efraimidis–Spirakis priority keys (u^(1/w)): pow() is not
    correctly rounded and differs across engines — un-oracle-able.
    Here EVERYTHING is integer arithmetic on positive operands
    (truncating division == floor division for both engines), so the
    sample is bit-reproducible across Spark, DuckDB, runs, and
    layouts.

    Scale shape: the cumulative sum uses the two-pass range-partitioned
    form (ranking.global_running_sum) — no single-partition window; the
    (total, step) scalars attach via a 1-row broadcast join. One range
    exchange + one tiny triangular join, nothing else.
    """
    from .ranking import global_running_sum

    if k <= 0:
        raise ValueError(f"systematic_pps_sample: k must be positive, got {k}")
    # Weights MUST be strictly positive: a negative weight makes the
    # cumulative line non-monotone (intervals overlap — picks get
    # duplicated/lost and the exactly-k invariant breaks), and an
    # all-zero total would divide by zero in the grid expression. Fail
    # loudly per-row rather than silently mis-sample: assert_true is
    # NULL when the predicate holds, so the when() wrapper keeps the
    # check inside the live expression tree (it can't be pruned) at
    # one JVM comparison per row.
    w_checked = F.when(
        F.assert_true(
            F.col(weight_col) > 0,
            F.concat(
                F.lit(f"systematic_pps_sample: non-positive {weight_col}="),
                F.col(weight_col).cast("string"),
            ),
        ).isNull(),
        F.col(weight_col).cast("long"),
    )
    ordered = df.select(
        id_col,
        w_checked.alias("_w"),
        F.md5(F.col(id_col).cast("string")).alias("_ok"),
    )
    cum = global_running_sum(ordered, ["_ok", id_col], "_w", out_col="_cum")
    totals = cum.groupBy().agg(F.max("_cum").alias("_total"))
    # grid step == _total exactly (intervals rescaled ×k); picks(c) =
    # #grid points ≤ c over grid {_total DIV 2 + j*_total : j ≥ 0}; the
    # shifted numerator keeps operands positive ⇒ DIV (truncate) ==
    # floor division in Spark AND DuckDB
    picks = "CAST(({c} + _total - (_total DIV 2)) DIV _total AS BIGINT)"
    return (
        cum.join(F.broadcast(totals))
        .withColumn(
            "n_picks",
            F.expr(picks.format(c=f"(_cum * {int(k)})"))
            - F.expr(picks.format(c=f"((_cum - _w) * {int(k)})")),
        )
        .filter(F.col("n_picks") > 0)
        .select(id_col, F.col("_w").alias("weight"), "n_picks")
    )


def grouped_split(
    df: DataFrame,
    fracs: list[tuple[str, float]],
    group_col: str,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic grouped train/valid/test assignment: every row
    whose `group_col` hashes into the same md5 bucket gets the same
    split label, so co-grouped rows (e.g. a near-dup cluster) can NEVER
    straddle a split boundary. `fracs` is an ordered list of
    (name, fraction) summing to 1; the last entry absorbs rounding.

    Same determinism contract as `mixture_sample`: md5-prefix
    lexicographic thresholds — reshuffle-proof, partition-independent,
    and replayable by any engine with md5. Narrow (no shuffle): one
    hash + a chain of string compares per row."""
    h = F.substring(F.md5(F.col(group_col).cast("string")), 1, _PREFIX_LEN)
    col = None
    cum = 0.0
    for name, fr in fracs[:-1]:
        cum += fr
        cond = h < F.lit(rate_threshold(cum))
        col = F.when(cond, name) if col is None else col.when(cond, name)
    col = F.lit(fracs[-1][0]) if col is None else col.otherwise(fracs[-1][0])
    return df.withColumn(out_col, col)
