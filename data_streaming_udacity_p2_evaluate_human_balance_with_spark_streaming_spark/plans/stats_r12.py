"""Round-12 registrations: rank-based scale testing, effect sizes,
partial/It-consistency correlation, rich-club graph structure,
Simpson's-paradox screening, and Hilbert-curve layout.

Like every plans module, each @register pairs the Spark plan with a
DuckDB oracle; exact-arithmetic disciplines (doubled ranks/scores,
fixed-point floors, shared single IEEE trees over exact integers) per
NOTES.md.

No counterpart exists in the reference (three linear streaming
scripts — SURVEY.md §2); north-star analytics extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from .queries import register

# ---------------------------------------------------------------------------
# Ansari-Bradley rank-based SCALE test (click vs view `value`): the
# dispersion complement to the location tests already in the registry
# (Mann-Whitney/Mood median = location, Brown-Forsythe = variance via
# absolute deviations); AB needs no centering at all — scores rank from
# BOTH ends (score(r) = min(r, N+1-r)), so equal-location samples with
# different spread separate purely through rank geometry.

#: DOUBLED AB block score sum over a tie block [a, b] (ranks a..b of
#: the pooled sample): 2*sum(min(r, N+1-r)) via triangular numbers
#: T2(x) = x(x+1) — everything stays integer, the doubled-rank
#: discipline. h = floor((N+1)/2) splits the score ridge.
_AB_S2 = (
    "(CASE WHEN a <= least(b, h) THEN"
    " least(b, h) * (least(b, h) + 1) - (a - 1) * a"
    " ELSE 0 END)"
    " + (CASE WHEN b >= greatest(a, h + 1) THEN"
    " 2 * (n_total + 1) * (b - greatest(a, h + 1) + 1)"
    " - (b * (b + 1)"
    "    - (greatest(a, h + 1) - 1) * greatest(a, h + 1))"
    " ELSE 0 END)"
)

#: per-block AB contribution for the click arm: n1v tied observations
#: each get the block-average score S2/(2t); floored to 1e9 fixed point
#: BEFORE the cross-block sum (one IEEE division of exact integers).
_AB_TERM_FP = (
    "CAST(floor(1000000000.0 * CAST(n1v AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " / (2.0 * CAST(t AS DOUBLE))) AS BIGINT)"
)

#: large-sample normal approximation (no-tie formulas; documented) —
#: identical expression tree in both engines, fed by exact integers.
_AB_Z = (
    "round((CAST(ab_fp AS DOUBLE) / 1000000000.0"
    " - (CASE WHEN n_total % 2 = 0"
    " THEN CAST(n1 AS DOUBLE) * (n_total + 2.0) / 4.0"
    " ELSE CAST(n1 AS DOUBLE) * (n_total + 1.0) * (n_total + 1.0)"
    " / (4.0 * CAST(n_total AS DOUBLE)) END))"
    " / sqrt(CASE WHEN n_total % 2 = 0"
    " THEN (CAST(n1 AS DOUBLE) * n2) * ((n_total + 2.0) * (n_total - 2.0))"
    " / (48.0 * (n_total - 1.0))"
    " ELSE (CAST(n1 AS DOUBLE) * n2) * ((n_total + 1.0)"
    " * (3.0 + CAST(n_total AS DOUBLE) * n_total))"
    " / (48.0 * CAST(n_total AS DOUBLE) * n_total) END), 6)"
)


@register(
    "ansari_bradley_click_view",
    f"""
    WITH arms AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    g AS (
      SELECT value, CAST(count(*) AS BIGINT) AS t,
        CAST(sum(a) AS BIGINT) AS n1v
      FROM arms GROUP BY value
    ),
    c AS (
      SELECT value, t, n1v, CAST(sum(t) OVER (ORDER BY value) AS BIGINT)
        AS cum
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(n1v) AS BIGINT) AS n1,
        CAST(sum(t - n1v) AS BIGINT) AS n2,
        CAST(sum(t) AS BIGINT) AS n_total
      FROM g
    ),
    blocks AS (
      SELECT c.cum - c.t + 1 AS a, c.cum AS b, c.t AS t, c.n1v,
        tot.n_total,
        CAST(floor((tot.n_total + 1) / 2.0) AS BIGINT) AS h
      FROM c, tot
    ),
    scored AS (
      SELECT n1v, t, {_AB_S2} AS s2 FROM blocks
    ),
    stat AS (
      SELECT CAST(sum({_AB_TERM_FP}) AS BIGINT) AS ab_fp FROM scored
    )
    SELECT tot.n1, tot.n2, tot.n_total, stat.ab_fp,
      round(CAST(stat.ab_fp AS DOUBLE) / 1000000000.0, 6) AS ab_stat,
      {_AB_Z} AS z_notie
    FROM tot, stat
    """,
)
def q_ansari_bradley_click_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ansari-Bradley rank SCALE test (click vs view `value`): are the
    two arms equally dispersed? — the spread complement to
    mannwhitney_u_click_view (location) and brown_forsythe (variance
    via absolute deviations); AB is fully rank-based, so it needs no
    location estimate and is outlier-robust. Scores count from both
    ends of the pooled ranking (min(r, N+1−r)); tied blocks take the
    block-average score.

    Exactness: the doubled-score trick keeps every block sum integer
    (2·Σ min(r, ·) via triangular numbers x(x+1), no division); the
    per-block average enters as ONE IEEE division floored to 1e9 fixed
    point before the cross-block sum; z uses the standard no-tie
    normal approximation (documented — value ties are < 2% of rows on
    this fixture) as a single shared expression tree.

    Scale shape: hash-agg on distinct values, the two-pass
    global_running_sum for pooled ranks (no single-partition window),
    then a 1-row reduce. Integer bounds: n1v·S2 ≤ t²·(N+1) ≈ 1e13 at
    sf1 — double-exact; the T2 products stay < 2^53 for N < 6.7e7
    (decimal graduation documented beyond)."""
    from ..operators.ranking import global_running_sum

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("a"),
        )
    )
    g = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("a").cast("bigint").alias("n1v"),
    )
    c = global_running_sum(g, ["value"], "t", "cum")
    tot = g.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("t") - F.col("n1v")).alias("n2"),
        F.sum("t").alias("n_total"),
    )
    blocks = c.crossJoin(F.broadcast(tot)).select(
        (F.col("cum") - F.col("t") + 1).alias("a"),
        F.col("cum").alias("b"),
        "t",
        "n1v",
        "n_total",
        F.expr("CAST(floor((n_total + 1) / 2.0) AS BIGINT)").alias("h"),
    )
    scored = blocks.select("n1v", "t", F.expr(_AB_S2).alias("s2"))
    stat = scored.agg(F.expr(f"CAST(sum({_AB_TERM_FP}) AS BIGINT)").alias("ab_fp"))
    return (
        tot.crossJoin(F.broadcast(stat))
        .select(
            "n1",
            "n2",
            "n_total",
            "ab_fp",
            F.expr(
                "round(CAST(ab_fp AS DOUBLE) / 1000000000.0, 6)"
            ).alias("ab_stat"),
            F.expr(_AB_Z).alias("z_notie"),
        )
    )


# ---------------------------------------------------------------------------
# Effect sizes: the MAGNITUDE companions to the registry's p-value
# tests — a 100 TB A/B readout needs "how big", not just "how sure".

#: shared final IEEE tree over the nine exact integer aggregates
#: (n1, n2, s1, s2, u1, u2, gt, lt on the cents scale; d/g/Glass are
#: scale-invariant, so the 100× cents factor cancels).
_EFF_FINAL = """
    SELECT n1, n2,
      round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / sqrt((CAST(u1 AS DOUBLE) / n1 + CAST(u2 AS DOUBLE) / n2)
               / (CAST(n1 AS DOUBLE) + n2 - 2.0)), 6) AS cohens_d,
      round(((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / sqrt((CAST(u1 AS DOUBLE) / n1 + CAST(u2 AS DOUBLE) / n2)
               / (CAST(n1 AS DOUBLE) + n2 - 2.0)))
        * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + n2) - 9.0)), 6)
        AS hedges_g,
      round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / sqrt(CAST(u2 AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))), 6)
        AS glass_delta,
      round(CAST(gt - LTPAIRS AS DOUBLE)
            / (CAST(n1 AS DOUBLE) * n2), 6) AS cliffs_delta
"""


@register(
    "effect_sizes_click_view",
    f"""
    WITH arms AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    g AS (
      SELECT c, CAST(count(*) AS BIGINT) AS t,
        CAST(sum(a) AS BIGINT) AS n1v
      FROM arms GROUP BY c
    ),
    cum AS (
      SELECT c, t, n1v,
        CAST(sum(t - n1v) OVER (ORDER BY c) AS BIGINT) AS cum2
      FROM g
    ),
    agg AS (
      SELECT
        CAST(sum(n1v) AS BIGINT) AS n1,
        CAST(sum(t - n1v) AS BIGINT) AS n2,
        CAST(sum(n1v * c) AS BIGINT) AS s1,
        CAST(sum((t - n1v) * c) AS BIGINT) AS s2,
        CAST(sum(n1v * c * c) AS BIGINT) AS q1,
        CAST(sum((t - n1v) * c * c) AS BIGINT) AS q2,
        CAST(sum(n1v * (cum2 - (t - n1v))) AS BIGINT) AS gt
      FROM cum
    ),
    u AS (
      SELECT n1, n2, s1, s2, gt,
        n1 * q1 - s1 * s1 AS u1,
        n2 * q2 - s2 * s2 AS u2,
        -- lt = pairs with click strictly below view: total non-tied
        -- pairs minus gt minus ties; ties = sum n1v*(t-n1v) per cent
        (SELECT CAST(sum(n1v * (t - n1v)) AS BIGINT) FROM g) AS tie_pairs
      FROM agg
    )
    {_EFF_FINAL.replace("LTPAIRS", "(n1 * n2 - gt - tie_pairs)")}
    FROM u
    """,
)
def q_effect_sizes_click_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Standardized EFFECT SIZES for click vs view `value` — the
    magnitude readout the registry's significance tests (Welch,
    Mann-Whitney, two-proportion z) stop short of: Cohen's d (pooled),
    Hedges' g (the small-sample bias factor 1 − 3/(4N−9)), Glass's Δ
    (control-arm denominator), and Cliff's δ (the rank effect size,
    = P(click > view) − P(click < view)).

    Exactness: moments on the exact cents scale (d/g/Δ are
    scale-invariant, so ×100 cancels; δ compares on cents, tie
    handling documented); u = n·Σc² − (Σc)² stays BIGINT (≤ ~2e16 at
    sf0.1; bound documented); Cliff's numerator comes from the
    distinct-cents running sum (gt = Σ n1v·view_below; lt by
    complement n1·n2 − gt − ties) — pure integers; the four outputs
    are ONE shared IEEE tree, round-6.

    Scale shape: hash-agg on distinct cents, two-pass running sum, a
    1-row reduce — no per-row ranks, no single-partition window."""
    from ..operators.ranking import global_running_sum

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
        .select(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("a"),
        )
    )
    g = ev.groupBy("c").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("a").cast("bigint").alias("n1v"),
    )
    g = g.withColumn("n2v", F.col("t") - F.col("n1v")).localCheckpoint(
        eager=False
    )
    cum = global_running_sum(g, ["c"], "n2v", "cum2")
    agg = cum.agg(
        F.sum("n1v").alias("n1"),
        F.sum("n2v").alias("n2"),
        F.sum(F.col("n1v") * F.col("c")).alias("s1"),
        F.sum(F.col("n2v") * F.col("c")).alias("s2"),
        F.sum(F.col("n1v") * F.col("c") * F.col("c")).alias("q1"),
        F.sum(F.col("n2v") * F.col("c") * F.col("c")).alias("q2"),
        F.sum(F.col("n1v") * (F.col("cum2") - F.col("n2v"))).alias("gt"),
    )
    ties = g.agg(
        F.sum(F.col("n1v") * F.col("n2v")).alias("tie_pairs")
    )
    u = (
        agg.crossJoin(F.broadcast(ties))
        .select(
            "n1",
            "n2",
            "s1",
            "s2",
            "gt",
            "tie_pairs",
            F.expr("n1 * q1 - s1 * s1").alias("u1"),
            F.expr("n2 * q2 - s2 * s2").alias("u2"),
        )
    )
    final = _EFF_FINAL.replace("LTPAIRS", "(n1 * n2 - gt - tie_pairs)")
    # reuse the oracle's SELECT list verbatim as Spark expressions
    exprs = [
        e.strip()
        for e in _split_select_list(final)
    ]
    return u.selectExpr(*exprs)


def _split_select_list(select_sql: str) -> list:
    """Split the shared `SELECT a, b, c` fragment into expression
    strings at top-level commas (so the identical IEEE trees feed both
    engines from one source of truth)."""
    body = select_sql.strip()
    assert body.upper().startswith("SELECT")
    body = body[len("SELECT"):]
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out
