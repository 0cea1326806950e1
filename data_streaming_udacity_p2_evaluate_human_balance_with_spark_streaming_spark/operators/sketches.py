"""Count-min sketch: fixed-size mergeable frequency sketch.

The 100 TB story: a CMS is a d×w counter grid whose size never grows
with the data — each partition folds its rows into ≤ d·w cells via
map-side partial aggregation (Spark's hash-aggregate IS the sketch
merge), so the shuffle carries at most `num_partitions · d · w` tiny
cells no matter how many trillions of input rows there are. Estimates
over-count (never under-count) by ≤ εN with probability 1-δ where
ε = e/w, δ = e^-d (Cormode & Muthukrishnan, J.Algorithms 2005).

Hash rows use md5 hex prefixes as bucket LABELS (strings, not ints):
`substring(md5(i || ':' || x), 1, 2)` gives 256 buckets per row with
zero hex→int conversion — portable to any ANSI engine (the DuckDB
oracle replays it byte-for-byte; xxhash64 would be Spark-only).

Complements `aggregates.hll_sketch_per_group` (distinct-count sketch):
HLL answers "how many distinct", CMS answers "how frequent is each".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default grid: 4 hash rows × 256 buckets (2 hex chars) → ε ≈ 1.1%·N,
#: δ ≈ 1.8%; 1024 cells regardless of input size.
DEFAULT_D = 4
BUCKET_HEX_CHARS = 2


def _bucket_expr(i_col: str, x_col: str) -> str:
    return (
        f"substring(md5(concat(CAST({i_col} AS STRING), ':', {x_col})), "
        f"1, {BUCKET_HEX_CHARS})"
    )


def cms_build(df: DataFrame, col: str, d: int = DEFAULT_D) -> DataFrame:
    """Build the sketch: (i, bucket, cnt) cells, ≤ d·256 rows total.

    The explode(×d) feeds straight into a hash aggregate whose key
    space is the fixed grid — partial (map-side) aggregation collapses
    every partition to its own ≤ d·256-cell sketch before the single
    tiny shuffle, which is exactly the distributed sketch-merge
    semantics (cell-wise sum).
    """
    return (
        df.select(F.col(col).cast("string").alias("x"))
        .select(
            "x",
            F.explode(F.array([F.lit(i) for i in range(d)])).alias("i"),
        )
        .withColumn("bucket", F.expr(_bucket_expr("i", "x")))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built over disjoint slices (days, shards,
    streams): cell-wise sum. Union of tiny frames — never touches the
    original data, the property that makes CMS incremental."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(items: DataFrame, sketch: DataFrame, col: str, d: int = DEFAULT_D) -> DataFrame:
    """Point-estimate frequencies for an item set: min over the d cells
    each item hashes to. The sketch (≤ 1024 rows) broadcasts; the item
    side never shuffles. Adds `est_count` (always ≥ the true count)."""
    probes = items.select(
        "*", F.explode(F.array([F.lit(i) for i in range(d)])).alias("i")
    ).withColumn(
        "bucket", F.expr(_bucket_expr("i", f"CAST({col} AS STRING)"))
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(*items.columns)
        .agg(F.min("cnt").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame, col: str, threshold: int, d: int = DEFAULT_D
) -> DataFrame:
    """Items whose CMS-estimated frequency meets `threshold`, with the
    exact count alongside for audit (est_count ≥ exact_count always —
    CMS never under-counts, so no true heavy hitter is missed; bucket
    collisions can only add false positives near the threshold).

    At 100 TB the exact-count audit column is the expensive part (a
    full-cardinality shuffle) — production callers estimate against a
    candidate stream instead; the audit variant is what the oracle
    certifies.
    """
    sketch = cms_build(df, col, d=d)
    exact = df.groupBy(col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(exact, sketch, col, d=d)
    return est.filter(F.col("est_count") >= threshold).select(
        col, "est_count", "exact_count"
    )
