"""Graph analytics beyond connected components (those live in
operators/dedup.py as cluster consolidation): triangle counting via
degree-oriented wedge closure — the MapReduce-era construction
(Suri & Vassilvitskii, "Counting triangles and the curse of the last
reducer") that bounds the quadratic wedge fan-out.

No graph analytics exists in the reference (three linear streaming
scripts, SURVEY.md §2); north-star extension. Triangle participation
is the standard cohesion signal over co-occurrence graphs (parts
co-ordered, docs co-cited, users co-active) — a curation feature for
community/boilerplate detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(
    edges: DataFrame,
    a_col: str = "pa",
    b_col: str = "pb",
) -> DataFrame:
    """Per-node triangle counts for an undirected simple graph given as
    (a, b) pairs with a < b, each edge once.

    Construction: orient every edge from its lower-(degree, id)
    endpoint to its higher one — a total order, so orientation is
    conflict-free — then join oriented edges on their source to form
    wedges (u→v, u→w with v before w in the same order), and close
    each wedge against the oriented edge set (v→w). Every triangle is
    found EXACTLY once: its unique lowest-order vertex is the wedge
    pivot. The orientation is the scale guard: wedge fan-out is
    Σ outdeg(u)², and out-degrees under the degree order are O(√m) —
    without it a single hub explodes the wedge join quadratically.

    Shuffles: one degree aggregate, two joins to attach endpoint
    degrees (AQE broadcasts the degree table when small), one wedge
    self-join keyed on the pivot, one closure hash join, one final
    per-node aggregate over the 3-exploded triangle rows. All equi —
    no cartesian anywhere.

    Returns (node, n_triangles), one row per node that participates in
    at least one triangle."""
    deg = (
        edges.select(F.col(a_col).alias("n"))
        .unionByName(edges.select(F.col(b_col).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orientation key: (degree, node) — lexicographic struct comparison
    keyed = (
        edges.join(deg.select(F.col("n").alias(a_col), F.col("d").alias("_da")), a_col)
        .join(deg.select(F.col("n").alias(b_col), F.col("d").alias("_db")), b_col)
        .select(
            F.when(
                F.struct("_da", a_col) < F.struct("_db", b_col), F.col(a_col)
            ).otherwise(F.col(b_col)).alias("s"),
            F.when(
                F.struct("_da", a_col) < F.struct("_db", b_col), F.col(b_col)
            ).otherwise(F.col(a_col)).alias("t"),
            F.when(
                F.struct("_da", a_col) < F.struct("_db", b_col), F.col("_db")
            ).otherwise(F.col("_da")).alias("_dt"),
        )
    )
    # oriented edges feed the wedge join (twice) and the closure probe
    o = keyed.localCheckpoint(eager=False)
    w1 = o.select(F.col("s"), F.col("t").alias("v"), F.col("_dt").alias("_dv"))
    w2 = o.select(F.col("s"), F.col("t").alias("w"), F.col("_dt").alias("_dw"))
    wedges = w1.join(w2, "s").filter(
        F.struct("_dv", "v") < F.struct("_dw", "w")
    )
    closed = wedges.join(
        o.select(F.col("s").alias("v"), F.col("t").alias("w")), ["v", "w"]
    ).select(F.col("s").alias("x"), F.col("v").alias("y"), F.col("w").alias("z"))
    nodes = (
        closed.select(F.col("x").alias("node"))
        .unionByName(closed.select(F.col("y").alias("node")))
        .unionByName(closed.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
