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
from .copurchase import copurchase_edges
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


# ---------------------------------------------------------------------------
# Partial correlation: does the click↔purchase daily co-movement
# survive controlling for overall traffic (views)? The registry has
# marginal association (spearman/kendall/distance correlation, Granger
# lead-lag); partial correlation is the standard confound screen.

#: shared final tree: three Pearson r's from the ten integer sums,
#: then the first-order partial formula.
_PC_FINAL = """
    SELECT n_days,
      round((CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
        6) AS r_xy,
      round((CAST(n_days AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)),
        6) AS r_xz,
      round((CAST(n_days AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)),
        6) AS r_yz,
      round((((CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
        - ((CAST(n_days AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)))
        * ((CAST(n_days AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))))
        / sqrt((1.0 - ((CAST(n_days AS DOUBLE) * sxz
                        - CAST(sx AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)))
          * ((CAST(n_days AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))))
        * (1.0 - ((CAST(n_days AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             * (CAST(n_days AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)))
          * ((CAST(n_days AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        / sqrt((CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             * (CAST(n_days AS DOUBLE) * szz
                - CAST(sz AS DOUBLE) * sz))))), 6) AS r_partial
"""


@register(
    "partial_correlation_daily",
    f"""
    WITH d AS (
      SELECT epoch_ns(ts) // 1000 // 86400000000 AS g,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS x,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS y,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS z
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(z) AS BIGINT) AS sz,
        CAST(sum(x * x) AS BIGINT) AS sxx,
        CAST(sum(y * y) AS BIGINT) AS syy,
        CAST(sum(z * z) AS BIGINT) AS szz,
        CAST(sum(x * y) AS BIGINT) AS sxy,
        CAST(sum(x * z) AS BIGINT) AS sxz,
        CAST(sum(y * z) AS BIGINT) AS syz
      FROM d
    )
    {_PC_FINAL}
    FROM s
    """,
)
def q_partial_correlation_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIRST-ORDER PARTIAL CORRELATION of daily click vs purchase
    volume CONTROLLING for view volume — the confound screen the
    marginal association family (spearman_value_vs_time,
    kendall_tau_daily_volume, distance_correlation, Granger) lacks:
    clicks and purchases both ride overall traffic, so their marginal
    r is inflated; r_xy.z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))
    asks what remains once traffic is partialled out.

    Exactness: one events scan → per-day (click, purchase, view)
    BIGINT counts → ten exact integer sums; the three Pearson r's and
    the partial are ONE shared IEEE tree (identical text in both
    engines), round-6. Bounds: day counts ≤ 1e6 → n·Σxy ≤ 1e15.

    Scale shape: one hash-agg to ≤ days rows, a 1-row reduce, and
    scalar arithmetic — nothing data-proportional after the scan."""
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("g"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("z"),
        )
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )
    return s.selectExpr(*[e.strip() for e in _split_select_list(_PC_FINAL)])


# ---------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of the per-day event-type
# counts treated as k "items" — the reliability readout used to ask
# whether a composite daily-activity score is coherent or one item
# moves on its own (the psychometrics twin of the drift family).

@register(
    "cronbachs_alpha_event_types",
    """
    WITH x AS (
      SELECT epoch_ns(ts) // 1000 // 86400000000 AS g, event_type,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT g FROM x),
    items AS (SELECT DISTINCT event_type FROM x),
    filled AS (
      SELECT d.g, i.event_type, coalesce(x.c, 0) AS c
      FROM days d CROSS JOIN items i
      LEFT JOIN x ON x.g = d.g AND x.event_type = i.event_type
    ),
    peritem AS (
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c) AS BIGINT) AS s,
        CAST(sum(c * c) AS BIGINT) AS q
      FROM filled GROUP BY 1
    ),
    iu AS (
      SELECT CAST(sum(n * q - s * s) AS BIGINT) AS sum_item_u,
        CAST(count(*) AS BIGINT) AS k
      FROM peritem
    ),
    daytot AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS tday FROM filled GROUP BY 1
    ),
    tu AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
        CAST(count(*) * sum(tday * tday) - sum(tday) * sum(tday)
             AS BIGINT) AS total_u
      FROM daytot
    )
    SELECT iu.k, tu.n_days, iu.sum_item_u, tu.total_u,
      round((CAST(iu.k AS DOUBLE) / (iu.k - 1.0))
            * (1.0 - CAST(iu.sum_item_u AS DOUBLE) / tu.total_u),
            6) AS alpha
    FROM iu, tu
    """,
)
def q_cronbachs_alpha_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CRONBACH'S ALPHA over the k event types as "items" scored by
    their daily counts: k/(k−1)·(1 − Σ var_item/var_total) — the
    internal-consistency coefficient asking whether the per-type daily
    volumes co-move as one construct (high alpha: a shared traffic
    factor drives all types) or fragment (an item drifting alone —
    the per-item view the PSI/drift family aggregates away).

    Exactness: variance RATIOS need no variance denominators — with
    every item observed on the same n days, Σvar_i/var_tot =
    Σ(n·Σx²−(Σx)²) / (n·ΣT²−(ΣT)²) on pure BIGINTs (denominators n²
    cancel); alpha is one shared IEEE division, round-6. Day-type
    cells zero-fill via the days×items spine (both bounded domains).

    Scale shape: one scan → (day, type) hash-agg; everything after
    runs on ≤ days·k rows."""
    x = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("g"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    days = x.select("g").distinct()
    items = x.select("event_type").distinct()
    filled = (
        days.crossJoin(F.broadcast(items))
        .join(x, ["g", "event_type"], "left")
        .select("g", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    peritem = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    iu = peritem.agg(
        F.sum(
            F.col("n") * F.col("q") - F.col("s") * F.col("s")
        ).alias("sum_item_u"),
        F.count(F.lit(1)).alias("k"),
    )
    daytot = filled.groupBy("g").agg(F.sum("c").alias("tday"))
    tu = daytot.agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.count(F.lit(1)) * F.sum(F.col("tday") * F.col("tday"))
            - F.sum("tday") * F.sum("tday")
        ).alias("total_u"),
    )
    return (
        iu.crossJoin(F.broadcast(tu))
        .selectExpr(
            "k",
            "n_days",
            "sum_item_u",
            "total_u",
            "round((CAST(k AS DOUBLE) / (k - 1.0))"
            " * (1.0 - CAST(sum_item_u AS DOUBLE) / total_u), 6)"
            " AS alpha",
        )
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient: do the high-degree parts of the co-purchase
# graph preferentially link to EACH OTHER? phi(k) = 2·E_k/(N_k(N_k−1))
# over the subgraph induced by nodes of degree > k — the hub-structure
# readout the degree/assortativity family (degree_powerlaw_mle,
# degree_assortativity_copurchase) brackets but never computes.

_RC_KS = (4, 8, 12, 16, 24)


@register(
    "rich_club_copurchase",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE substr(md5(CAST(l_partkey AS VARCHAR)), 1, 1) IN ('0','1')
    ),
    e0 AS (
      SELECT DISTINCT a.l_partkey pa, b.l_partkey pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT pa AS s, pb AS d FROM e0
            UNION ALL SELECT pb, pa FROM e0),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY 1),
    ks AS (SELECT unnest(ARRAY{list(_RC_KS)}) AS k),
    nk AS (
      -- count the joined column, not *: an unmatched spine row must
      -- yield 0, not 1 (caught by sf0.001 parity where the top
      -- thresholds are empty)
      SELECT ks.k, CAST(count(deg.node) AS BIGINT) AS n_rich
      FROM ks LEFT JOIN deg ON deg.deg > ks.k GROUP BY 1
    ),
    ek AS (
      SELECT ks.k, CAST(count(ed.pa) AS BIGINT) AS e_rich
      FROM ks LEFT JOIN (
        SELECT e0.pa, e0.pb, da.deg AS dega, db.deg AS degb
        FROM e0 JOIN deg da ON da.node = e0.pa
                JOIN deg db ON db.node = e0.pb
      ) ed ON ed.dega > ks.k AND ed.degb > ks.k
      GROUP BY 1
    )
    SELECT nk.k, nk.n_rich, ek.e_rich,
      CASE WHEN nk.n_rich >= 2 THEN
        round(2.0 * ek.e_rich
              / (CAST(nk.n_rich AS DOUBLE) * (nk.n_rich - 1.0)), 6)
      ELSE NULL END AS phi
    FROM nk JOIN ek ON ek.k = nk.k
    """,
)
def q_rich_club_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RICH-CLUB COEFFICIENT phi(k) of the sampled co-purchase graph
    (md5 0-1 part slice, the ANF-m64 graph): among nodes with degree
    > k, what fraction of possible edges exist? Rising phi(k) = hubs
    form a club (the supply-chain core); flat = hubs connect through
    the periphery. Completes the hub-structure story next to
    degree_powerlaw_mle (how heavy the tail) and
    degree_assortativity_copurchase (whether degree correlates across
    edges).

    Exactness: counts are exact integers; phi is one IEEE division
    round-6; N_k < 2 yields NULL (division undefined — the branch is
    exercised at small SFs where no node exceeds the top threshold).

    Scale shape: degree = one hash-agg on the symmetric edge list;
    E_k = edges joined to the degree table twice (hash equi-joins, no
    cartesian — the 5-row threshold spine broadcasts); everything
    aggregates per k. LEFT joins on the spine keep zero-count
    thresholds present."""
    e0 = copurchase_edges(
        spark, sf_dir, sample_chars=("0", "1")
    ).localCheckpoint(eager=False)
    sym = e0.select(F.col("pa").alias("node")).unionByName(
        e0.select(F.col("pb").alias("node"))
    )
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    ks = spark.createDataFrame([(k,) for k in _RC_KS], "k int")
    nk = (
        F.broadcast(ks)
        .join(deg, deg["deg"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.count("node").cast("bigint").alias("n_rich"))
    )
    ed = (
        e0.join(
            deg.select(
                F.col("node").alias("na"), F.col("deg").alias("dega")
            ),
            F.col("pa") == F.col("na"),
        )
        .join(
            deg.select(
                F.col("node").alias("nb"), F.col("deg").alias("degb")
            ),
            F.col("pb") == F.col("nb"),
        )
        .select("pa", "pb", "dega", "degb")
    )
    ek = (
        F.broadcast(ks.withColumnRenamed("k", "k2"))
        .join(
            ed,
            (F.col("dega") > F.col("k2")) & (F.col("degb") > F.col("k2")),
            "left",
        )
        .groupBy("k2")
        .agg(F.count("pa").cast("bigint").alias("e_rich"))
    )
    return (
        nk.join(ek, nk["k"] == ek["k2"])
        .selectExpr(
            "k",
            "n_rich",
            "e_rich",
            "CASE WHEN n_rich >= 2 THEN"
            " round(2.0 * e_rich"
            " / (CAST(n_rich AS DOUBLE) * (n_rich - 1.0)), 6)"
            " ELSE NULL END AS phi",
        )
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: per-stratum vs pooled association
# direction for the click-vs-view high-value 2x2, stratified by
# day-of-week. Association sign compares odds ratios WITHOUT division:
# OR > 1 iff a*d > b*c on exact integers.

@register(
    "simpsons_paradox_check",
    """
    WITH base AS (
      SELECT (epoch_ns(ts) // 1000 // 86400000000) % 7 AS dw,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ex,
        CASE WHEN CAST(round(value * 100) AS BIGINT) >= 3500
             THEN 1 ELSE 0 END AS hi
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    strat AS (
      SELECT dw,
        CAST(sum(ex * hi) AS BIGINT) AS a,
        CAST(sum(ex * (1 - hi)) AS BIGINT) AS b,
        CAST(sum((1 - ex) * hi) AS BIGINT) AS c,
        CAST(sum((1 - ex) * (1 - hi)) AS BIGINT) AS d
      FROM base GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(sum(a) AS BIGINT) AS pa, CAST(sum(b) AS BIGINT) AS pb,
        CAST(sum(c) AS BIGINT) AS pc, CAST(sum(d) AS BIGINT) AS pd
      FROM strat
    )
    SELECT s.dw, s.a, s.b, s.c, s.d,
      s.a * s.d - s.b * s.c AS or_cross,
      (s.a * s.d > s.b * s.c) AS stratum_positive,
      (p.pa * p.pd > p.pb * p.pc) AS pooled_positive,
      ((s.a * s.d > s.b * s.c) != (p.pa * p.pd > p.pb * p.pc))
        AS reversed_vs_pooled
    FROM strat s CROSS JOIN pooled p
    """,
)
def q_simpsons_paradox_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SIMPSON'S-PARADOX SCREEN on the click-vs-view high-value 2×2
    (value ≥ 35.00, ≈ the pooled median so both outcome cells fill),
    stratified by day-of-week: does the association between arm and
    high-value run the same way inside every stratum as it does
    pooled? A reversal (stratum direction ≠ pooled direction) is the
    aggregation-bias warning every segment-level readout needs before
    trusting a pooled lift — the screen the stratified family
    (mantel_haenszel, stratified_ate) assumes was run.

    Exactness: association direction compares odds ratios WITHOUT
    division — OR > 1 iff a·d > b·c on exact BIGINTs (cells ≤ 1e9 ⇒
    products ≤ 1e18, int64-safe); every output is an integer or a
    boolean, so the driver hash is exact with no fp at all.

    Measured non-vacuity (sf0.01): stratum signs split 5 positive /
    2 negative against a positive pool — both reversal branches real.

    Scale shape: one scan → 7-row stratified hash-agg → 1-row pooled
    reduce broadcast back. Nothing data-proportional after the scan."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
        .select(
            F.expr(
                "(unix_micros(ts) div 86400000000) % 7"
            ).alias("dw"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("ex"),
            F.expr(
                "CASE WHEN CAST(round(value * 100) AS BIGINT) >= 3500"
                " THEN 1 ELSE 0 END"
            ).alias("hi"),
        )
    )
    strat = base.groupBy("dw").agg(
        F.sum(F.col("ex") * F.col("hi")).cast("bigint").alias("a"),
        F.sum(F.col("ex") * (1 - F.col("hi"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ex")) * F.col("hi")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ex")) * (1 - F.col("hi")))
        .cast("bigint")
        .alias("d"),
    )
    pooled = strat.agg(
        F.sum("a").alias("pa"),
        F.sum("b").alias("pb"),
        F.sum("c").alias("pc"),
        F.sum("d").alias("pd"),
    )
    return strat.crossJoin(F.broadcast(pooled)).selectExpr(
        "dw",
        "a",
        "b",
        "c",
        "d",
        "a * d - b * c AS or_cross",
        "(a * d > b * c) AS stratum_positive",
        "(pa * pd > pb * pc) AS pooled_positive",
        "((a * d > b * c) != (pa * pd > pb * pc)) AS reversed_vs_pooled",
    )


# ---------------------------------------------------------------------------
# Hilbert-curve layout: the locality-preserving alternative to
# zorder_cells. Z-order (Morton) interleaves bits and takes long
# diagonal jumps between quadrants; the Hilbert curve visits every
# cell of the 256x256 grid in unit steps, so range reads over the
# curve index touch tighter spatial neighborhoods — the better
# data-layout key for similarity-clustered parquet files.

_HILBERT_N = 256


def _hilbert_round_exprs(s: int) -> list[str]:
    """One unrolled round of the classic xy2d transform (state columns
    x, y, d; side n=256): pure CASE/integer arithmetic valid verbatim
    in Spark AND DuckDB (no ^ — it is XOR in Spark but POWER in
    DuckDB; no DIV/`//` divergence — bit tests use `&`, which both
    engines share). Property-certified by
    tests/test_property_stats.py: bijection [0, 65536) with unit
    Manhattan steps — the two facts that UNIQUELY pin a Hilbert
    curve, so a transcription slip cannot survive the test."""
    nm1 = _HILBERT_N - 1
    return [
        f"d + {s * s} * (CASE"
        f" WHEN (x & {s}) > 0 AND (y & {s}) > 0 THEN 2"
        f" WHEN (x & {s}) > 0 THEN 3"
        f" WHEN (y & {s}) > 0 THEN 1"
        f" ELSE 0 END) AS d",
        f"CASE WHEN (y & {s}) > 0 THEN x"
        f" WHEN (x & {s}) > 0 THEN {nm1} - y ELSE y END AS x",
        f"CASE WHEN (y & {s}) > 0 THEN y"
        f" WHEN (x & {s}) > 0 THEN {nm1} - x ELSE x END AS y",
    ]


def _hilbert_oracle() -> str:
    rounds = []
    prev = "c0"
    for i, s in enumerate([128, 64, 32, 16, 8, 4, 2, 1]):
        ex = _hilbert_round_exprs(s)
        rounds.append(
            f"c{i + 1} AS (SELECT cell_x, cell_y, n_vecs,"
            f" {ex[0]}, {ex[1]}, {ex[2]} FROM {prev})"
        )
        prev = f"c{i + 1}"
    chain = ",\n    ".join(rounds)
    return f"""
    WITH q AS (
      SELECT CAST(least(greatest(floor(
               ((embedding::DOUBLE[])[1] + 1.0) * 128.0), 0), 255)
             AS BIGINT) AS cell_x,
        CAST(least(greatest(floor(
               ((embedding::DOUBLE[])[2] + 1.0) * 128.0), 0), 255)
             AS BIGINT) AS cell_y
      FROM embeddings
    ),
    cells AS (
      SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS n_vecs
      FROM q GROUP BY 1, 2
    ),
    c0 AS (
      SELECT cell_x, cell_y, n_vecs, cell_x AS x, cell_y AS y,
        CAST(0 AS BIGINT) AS d
      FROM cells
    ),
    {chain}
    SELECT cell_x, cell_y, n_vecs, d AS hilbert_d,
      CAST(floor(d / 1024.0) AS BIGINT) AS curve_bucket
    FROM {prev}
    """


@register("hilbert_curve_cells", _hilbert_oracle())
def q_hilbert_curve_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-CURVE cell index over the embedding table's first two
    dimensions (256×256 grid) — the locality-preserving data-layout
    key next to zorder_cells: Morton order jumps across quadrant
    seams, the Hilbert curve moves in unit steps, so sorting files by
    hilbert_d gives strictly tighter spatial runs for range reads
    (curve_bucket = 1024-cell segments is the file-assignment view).

    Exactness: quantization is floor((v+1)·128) clamped to [0,255] on
    doubles widened from the stored floats (identical in both
    engines); the 8 unrolled xy2d rounds are pure integer CASE
    arithmetic shared VERBATIM between Spark and DuckDB
    (_hilbert_round_exprs — no ^/DIV dialect traps); outputs are all
    integers, so the driver hash is fp-free. The transform itself is
    property-certified (bijection + unit steps) in
    tests/test_property_stats.py.

    Scale shape: one scan → (cell_x, cell_y) hash-agg bounded at
    65,536 rows; the bit-twiddling runs on cells, not vectors."""
    q = load_table(spark, sf_dir, "embeddings").select(
        F.expr(
            "CAST(least(greatest(floor("
            "(CAST(element_at(embedding, 1) AS DOUBLE) + 1.0) * 128.0),"
            " 0), 255) AS BIGINT)"
        ).alias("cell_x"),
        F.expr(
            "CAST(least(greatest(floor("
            "(CAST(element_at(embedding, 2) AS DOUBLE) + 1.0) * 128.0),"
            " 0), 255) AS BIGINT)"
        ).alias("cell_y"),
    )
    cells = q.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    cur = cells.selectExpr(
        "cell_x",
        "cell_y",
        "n_vecs",
        "cell_x AS x",
        "cell_y AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    for s in [128, 64, 32, 16, 8, 4, 2, 1]:
        cur = cur.selectExpr(
            "cell_x", "cell_y", "n_vecs", *_hilbert_round_exprs(s)
        )
    return cur.selectExpr(
        "cell_x",
        "cell_y",
        "n_vecs",
        "d AS hilbert_d",
        "CAST(floor(d / 1024.0) AS BIGINT) AS curve_bucket",
    )
