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
