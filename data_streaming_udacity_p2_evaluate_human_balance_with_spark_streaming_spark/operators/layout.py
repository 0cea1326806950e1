"""Write-layout clustering: Z-order (Morton) interleaving for
multi-column scan pruning.

At 100 TB, file skipping is the cheapest optimization there is: parquet
row-group min/max stats prune whole files BEFORE any I/O, but only if
rows that are close in the filter columns are close in the file layout.
Sorting by one column perfects pruning on that column and destroys it
on every other; Z-ordering interleaves the bits of several columns so
every clustered file covers a small hyper-rectangle of the combined
key space — filters on ANY clustered column (or combination) skip most
files. Same construction as Delta/Iceberg OPTIMIZE ZORDER BY; no
layout operator exists in the reference (it writes no files at all).

Everything is closed-form JVM arithmetic (quantize → interleave →
repartitionByRange on the z-value), so the z-value computation is
SQL-expressible and oracled (plans/queries.py:zorder_cells), and the
write path adds exactly ONE range shuffle — the same cost as the sort
a single-column layout would need anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantization resolution per dimension (8 bits → 256 cells/dim; a
#: 2-D z-value then spans 16 bits). More bits sharpen pruning but only
#: up to file granularity — 8 is plenty for thousands of files.
DEFAULT_BITS = 8


def quantize_expr(col: str, mn: str, mx: str, bits: int = DEFAULT_BITS) -> str:
    """SQL text: `col` linearly quantized to [0, 2^bits) using the
    (broadcast) global min/max columns `mn`/`mx`. floor() before the
    cast — DuckDB's double→int cast rounds while Spark truncates, so
    the oracle replicates this exactly only with an explicit floor.
    Degenerate range (mn = mx) maps to 0."""
    scale = (1 << bits) - 1
    return (
        f"CAST(least(floor(CASE WHEN {mx} = {mn} THEN 0.0 "
        f"ELSE (CAST({col} AS DOUBLE) - {mn}) / ({mx} - {mn}) * {scale + 1} END), "
        f"{scale}.0) AS BIGINT)"
    )


def interleave_expr(q1: str, q2: str, bits: int = DEFAULT_BITS, dialect: str = "spark") -> str:
    """SQL text: Morton interleave of two pre-quantized values — bit b
    of `q1` lands at position 2b, bit b of `q2` at 2b+1. Generated as a
    flat sum of 2*bits constant-shift terms (whole-stage codegen folds
    it into straight-line integer ops; no loop, no UDF)."""
    if dialect == "spark":
        terms = [
            f"shiftleft(shiftright({q}, {b}) & 1, {2 * b + off})"
            for b in range(bits)
            for off, q in ((0, q1), (1, q2))
        ]
    else:  # duckdb
        terms = [
            f"((({q} >> {b}) & 1) << {2 * b + off})"
            for b in range(bits)
            for off, q in ((0, q1), (1, q2))
        ]
    return "(" + " + ".join(terms) + ")"


def with_zorder_value(
    df: DataFrame,
    col1: str,
    col2: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "_z",
) -> DataFrame:
    """Append the 2-D z-value of (col1, col2). The global min/max
    enter as a broadcast 1-row aggregate cross join — fully lazy, no
    driver-side action (same pattern as tfidf's corpus size; an eager
    min/max would be a second full scan at 100 TB)."""
    mm = df.agg(
        F.min(F.col(col1).cast("double")).alias("_mn1"),
        F.max(F.col(col1).cast("double")).alias("_mx1"),
        F.min(F.col(col2).cast("double")).alias("_mn2"),
        F.max(F.col(col2).cast("double")).alias("_mx2"),
    )
    q1 = quantize_expr(col1, "_mn1", "_mx1", bits)
    q2 = quantize_expr(col2, "_mn2", "_mx2", bits)
    # chained selects: quantize once, THEN interleave (CollapseProject
    # won't re-inline the quantization into each of the 2*bits terms)
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("_q1", F.expr(q1))
        .withColumn("_q2", F.expr(q2))
        .withColumn(out_col, F.expr(interleave_expr("_q1", "_q2", bits)))
        .drop("_mn1", "_mx1", "_mn2", "_mx2", "_q1", "_q2")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write parquet clustered by z-order: one range shuffle on the
    z-value splits the Morton curve into `n_files` contiguous segments,
    each covering a compact region of (col1, col2) space — so parquet
    footer min/max stats prune files for filters on either column.
    Local sort within each file tightens row-group stats for free."""
    (
        with_zorder_value(df, col1, col2, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
