"""Z-order (Morton) clustering at write time: multi-dimensional data
skipping for parquet.

Range-partitioning + sorting on ONE column gives perfect min/max
pruning on that column and none on any other. Interleaving the bits of
two (or more) key columns into a Morton code and range-clustering on
THAT gives every file a tight min/max envelope on EVERY interleaved
dimension — so a filter on any of them prunes files/row-groups at scan
time. This is the layout Delta/Iceberg expose as `ZORDER BY` /
z-order sort orders; here it is plain Spark: a codegen'd bit-interleave
expression + repartitionByRange + sortWithinPartitions + parquet.

The reference has no write path beyond a Kafka sink (SURVEY.md §2.2);
this is north-star scale infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 16,
    key_col: str = "_zkey",
) -> DataFrame:
    """Add the Morton-code column over `cols`: each column min/max
    scaled to `bits_per_dim` bits (one cheap bounds agg — at a real
    deployment these come from table stats), then bit-interleaved.
    Pure JVM shifts/ors inside whole-stage codegen; no UDF. Total key
    width len(cols)*bits_per_dim must stay < 63 bits."""
    n = len(cols)
    if n * bits_per_dim > 62:
        raise ValueError("z-key would overflow a signed 64-bit integer")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()

    with_scaled = df
    top = (1 << bits_per_dim) - 1
    for d, c in enumerate(cols):
        lo = bounds[f"min_{c}"] or 0.0
        hi = bounds[f"max_{c}"] or 0.0
        span = (hi - lo) or 1.0
        frac = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
        clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        with_scaled = with_scaled.withColumn(
            f"_z_{d}", F.floor(clamped * top).cast("bigint")
        )
    interleave = " + ".join(
        f"shiftleft(shiftright(_z_{d}, {i}) & 1, {d + n * i})"
        for d in range(n)
        for i in range(bits_per_dim)
    )
    return with_scaled.withColumn(key_col, F.expr(interleave)).drop(
        *[f"_z_{d}" for d in range(n)]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 16,
    n_files: int = 16,
) -> None:
    """Write `df` as parquet clustered by the Morton interleave of
    `cols`: repartitionByRange on the z-key (contiguous z-ranges per
    file) + sortWithinPartitions (tight row-group envelopes) — every
    file gets a narrow min/max box in ALL `cols`, so scans filtering on
    any of them skip most files via footer stats."""
    keyed = with_zorder_key(df, cols, bits_per_dim)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
