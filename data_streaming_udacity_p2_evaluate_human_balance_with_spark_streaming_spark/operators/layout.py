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

(Supersedes round 2's sources/clustered.py, which computed the
quantization bounds with an eager driver-side `.first()` — a full
extra scan plus a barrier at 100 TB. Here the bounds ride along as a
broadcast 1-row aggregate cross join, keeping the plan lazy
end-to-end; in a real deployment they'd come from table stats.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


def interleave_expr(
    qcols: list[str], bits: int = DEFAULT_BITS, dialect: str = "spark"
) -> str:
    """SQL text: Morton interleave of pre-quantized values — bit b of
    dimension d lands at position len(qcols)*b + d. Generated as a flat
    sum of len(qcols)*bits constant-shift terms (whole-stage codegen
    folds it into straight-line integer ops; no loop, no UDF)."""
    n = len(qcols)
    if n * bits > 62:
        raise ValueError("z-value would overflow a signed 64-bit integer")
    if dialect == "spark":
        terms = [
            f"shiftleft(shiftright({q}, {b}) & 1, {n * b + d})"
            for b in range(bits)
            for d, q in enumerate(qcols)
        ]
    else:  # duckdb
        terms = [
            f"((({q} >> {b}) & 1) << {n * b + d})"
            for b in range(bits)
            for d, q in enumerate(qcols)
        ]
    return "(" + " + ".join(terms) + ")"


def with_zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "_z",
) -> DataFrame:
    """Append the Morton z-value of `cols`. The global min/max enter as
    a broadcast 1-row aggregate cross join — fully lazy, no driver-side
    action (same pattern as tfidf's corpus size; an eager bounds fetch
    would be a second full scan at 100 TB)."""
    mm = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn{d}") for d, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_mx{d}") for d, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(mm))
    qnames = []
    for d, c in enumerate(cols):
        qnames.append(f"_q{d}")
        out = out.withColumn(
            f"_q{d}", F.expr(quantize_expr(c, f"_mn{d}", f"_mx{d}", bits))
        )
    # chained withColumns: quantize once, THEN interleave
    # (CollapseProject won't re-inline the quantization into each of
    # the n*bits terms)
    out = out.withColumn(out_col, F.expr(interleave_expr(qnames, bits)))
    drop = [f"_mn{d}" for d in range(len(cols))]
    drop += [f"_mx{d}" for d in range(len(cols))]
    return out.drop(*drop, *qnames)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the standing maintenance job of every
    streaming landing zone: micro-batch sinks deposit thousands of
    KB-sized files, and at 100 TB the resulting open/seek/footer
    overhead (plus NameNode/listing pressure) dwarfs the data cost.
    Rewrites `path` into ceil(total_bytes / target_file_bytes) files
    via coalesce — a NARROW rewrite, no shuffle — staged into a temp
    dir and atomically swapped so readers never see a half-compacted
    table. Returns the new file count.

    Row order is not preserved (irrelevant for parquet tables); run
    zorder_write instead when the table should also be re-clustered."""
    import math
    import shutil
    import tempfile

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_out = max(1, math.ceil(total / target_file_bytes))

    tmp = tempfile.mkdtemp(prefix="_compact_")
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    # swap: move the compacted table into place (local-FS rename; on a
    # real object store this is the table format's commit — Delta/
    # Iceberg snapshot swap)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write parquet clustered by z-order: one range shuffle on the
    z-value splits the Morton curve into `n_files` contiguous segments,
    each covering a compact region of the `cols` space — so parquet
    footer min/max stats prune files for filters on any clustered
    column. Local sort within each file tightens row-group stats for
    free."""
    (
        with_zorder_value(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_files_per_partition: int = 1,
    n_tasks: int | None = None,
) -> None:
    """Hive-style directory-partitioned parquet layout
    (`path/col=value/…`): the lake convention that turns partition-
    column filters into DIRECTORY pruning — `PartitionFilters` in the
    scan, zero I/O for pruned partitions, cheaper than row-group
    min/max skipping (which still opens footers). Complements Z-order:
    partition on the coarse always-filtered column (date, lang),
    Z-order WITHIN partitions for the rest.

    Small-files discipline WITHOUT a parallelism funnel: without any
    repartition, every task writes a file into every partition
    directory it holds rows for (tasks × partitions files — the
    classic lake mistake). Hash-repartitioning on the partition
    columns alone fixes the file count but funnels each directory
    through exactly one task. Instead we repartition on
    (partition_cols + salt) where the salt takes
    `max_files_per_partition` values: a directory's rows land in at
    most that many distinct (values, salt) combos → at most that many
    tasks → at most that many files, while the write itself runs with
    `n_tasks` (default `defaultParallelism`) tasks of cluster-wide
    parallelism. The salt is `spark_partition_id() % m` — deterministic
    for a given input partitioning and free (no row hashing); with
    input partitions ≫ m it spreads each directory's bytes evenly
    across its m writers."""
    m = max(1, max_files_per_partition)
    sc = df.sparkSession.sparkContext
    n = n_tasks or sc.defaultParallelism
    (
        df.withColumn("_salt", F.spark_partition_id() % m)
        .repartition(n, *[F.col(c) for c in partition_cols], F.col("_salt"))
        .drop("_salt")
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )
