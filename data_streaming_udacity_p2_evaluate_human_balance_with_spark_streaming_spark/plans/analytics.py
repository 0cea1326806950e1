"""Product-analytics and sketch queries beyond the reference surface.

The reference computes per-customer risk over a single stream
(SURVEY.md §3); a team running it on a warehouse-scale event table
immediately needs the classic follow-ups — funnels, retention cohorts,
rolling windows, trend fits — plus curation ops (per-domain caps, fuzzy
near-match) and mergeable sketches for the 100 TB path. Everything here
is a `@register` query with a full DuckDB oracle; each docstring carries
the scale argument for its plan shape.

Registered by the `from . import analytics` at the bottom of
`plans.queries` so registration order stays in one place; driver-window
placement is computed (`_driver_order`: never-checked names first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.files import load_table
from .copurchase import copurchase_edges, copurchase_pair_counts
from .queries import register


@register(
    "event_funnel_stages",
    """
    WITH u1 AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ), u2 AS (
      SELECT e.user_id, t1,
        min(CASE WHEN e.event_type = 'click' AND e.ts > t1 THEN e.ts END) AS t2
      FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id, t1
    ), u3 AS (
      SELECT e.user_id, t1, t2,
        min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2 THEN e.ts END) AS t3
      FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id, t1, t2
    )
    SELECT count(*) AS n_users, count(t1) AS n_view,
           count(t2) AS n_view_click, count(t3) AS n_full_funnel
    FROM u3
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → later click → later purchase).

    Stage timestamps are successive conditional mins, each window
    referencing the previous stage's column. All three Window ops share
    one partitionBy(user_id) spec, so Catalyst plans a SINGLE shuffle and
    runs the windows back-to-back in one stage; the final global count is
    a partial-agg reduce of one row per task. At 100 TB this is one
    user-keyed exchange — the same cost as any per-user aggregate — and
    no join (the oracle's CTE joins are the SQL spelling, not the plan).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    df = df.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    return df.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.when(F.col("t1").isNotNull(), F.col("user_id"))).alias(
            "n_view"
        ),
        F.countDistinct(F.when(F.col("t2").isNotNull(), F.col("user_id"))).alias(
            "n_view_click"
        ),
        F.countDistinct(F.when(F.col("t3").isNotNull(), F.col("user_id"))).alias(
            "n_full_funnel"
        ),
    )


@register(
    "retention_cohort_weeks",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    )
    SELECT cohort AS cohort_week,
      CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
      count(*) AS n_users
    FROM active JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-active
    week, counted in each later week they return.

    Both date_trunc('week', …) calls land on Monday in Spark and DuckDB,
    so offsets are exact multiples of 7 days. Plan: one user-keyed
    aggregate for cohorts, one (user, week) distinct, then an equi-join
    back on user_id — the distinct's hash partitioning already clusters
    user_id, and AQE usually plans the cohort side (one row per user,
    two small columns) as the build side. The output is bounded by
    weeks², independent of event volume."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            F.expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "rolling_hour_avg",
    """
    SELECT event_id, user_id,
      round(avg(value) OVER w, 4) AS roll_avg,
      count(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_hour_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour average per user — an event-time RANGE
    frame, the batch twin of a sliding streaming window.

    Spark range frames need a numeric sort key, so the frame runs over
    unix_micros(ts) with [-3.6e9, 0]; inclusive bounds match DuckDB's
    INTERVAL frame exactly (ties at the boundary land in both). One
    shuffle on user_id; the frame is evaluated with a sliding two-pointer
    over each partition, O(n) per user, no quadratic blowup on dense
    users."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("roll_avg"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@register(
    "regr_value_vs_time",
    """
    SELECT event_type,
      round(regr_slope(value, date_diff('microsecond', TIMESTAMP '2024-01-01', ts) / 86400000000.0), 4) AS slope_per_day,
      round(regr_intercept(value, date_diff('microsecond', TIMESTAMP '2024-01-01', ts) / 86400000000.0), 4) AS intercept,
      round(regr_r2(value, date_diff('microsecond', TIMESTAMP '2024-01-01', ts) / 86400000000.0), 6) AS r2,
      CAST(regr_count(value, date_diff('microsecond', TIMESTAMP '2024-01-01', ts) / 86400000000.0) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_regr_value_vs_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of value over time via the SQL-standard
    regr_* aggregates (one pass, mergeable partial aggregation — the
    distributed shape; no iterative solver needed for 1-D OLS).

    The x axis is days since 2024-01-01, not raw epoch: centering keeps
    x ~O(10) so the covariance/variance terms don't cancel catastrophically
    and both engines agree at 4 decimal places."""
    ev = load_table(spark, sf_dir, "events")
    x = (
        (F.unix_micros("ts") - F.unix_micros(F.lit("2024-01-01").cast("timestamp")))
        / 86_400_000_000.0
    ).alias("x")
    d = ev.select("event_type", F.col("value"), x)
    return d.groupBy("event_type").agg(
        F.round(F.regr_slope("value", "x"), 4).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "x"), 4).alias("intercept"),
        F.round(F.regr_r2("value", "x"), 6).alias("r2"),
        F.regr_count("value", "x").cast("long").alias("n"),
    )


@register(
    "domain_cap_sample",
    """
    SELECT doc_id, source, rn FROM (
      SELECT doc_id, source,
        row_number() OVER (
          PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most K=10 documents per source, chosen by
    md5(doc_id) order — a deterministic, engine-agnostic shuffle that
    both sides replicate bit-for-bit (no rand(), no partition-layout
    dependence). This is the standard pretraining-mix guard against a
    single crawl domain dominating the corpus.

    Plan: one hash partition on source + per-key sort. For mega-domains
    (a single source holding ~a whole executor's worth of docs) the
    row_number sort is the skew point; the two-phase refinement — local
    per-partition top-K on (source, md5) then global top-K per source —
    bounds any task at K·partitions rows and reuses
    operators/ranking.py's machinery. At K=10 per source the output is
    negligible next to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
    )


@register(
    "quantile_bins_sketch",
    """
    WITH binned AS (
      SELECT o_orderpriority, CAST(floor(o_totalprice / 2500) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), c AS (
      SELECT o_orderpriority, bin, cnt,
        sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
        sum(cnt) OVER (PARTITION BY o_orderpriority) AS total
      FROM binned
    )
    SELECT o_orderpriority,
      CAST(min(CASE WHEN 100 * cum >= 50 * total THEN bin END) * 2500 AS DOUBLE) AS p50_edge,
      CAST(min(CASE WHEN 100 * cum >= 90 * total THEN bin END) * 2500 AS DOUBLE) AS p90_edge,
      CAST(min(CASE WHEN 100 * cum >= 99 * total THEN bin END) * 2500 AS DOUBLE) AS p99_edge,
      CAST(max(total) AS BIGINT) AS n
    FROM c GROUP BY o_orderpriority
    """,
)
def q_quantile_bins_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram quantiles — the mergeable-sketch answer to
    percentiles at 100 TB. Unlike percentile_approx (whose internal
    t-digest no SQL oracle can replicate), a fixed 2500-wide binning is
    exactly reproducible in DuckDB, and the p-edge-of-bin estimate is
    deterministic integer arithmetic end-to-end.

    Plan: partial-aggregated groupBy down to ≤(priorities × 200) rows —
    the only full-data pass — then windows/joins over the tiny sketch
    table. Sketches from different data shards union + re-aggregate
    without rescanning (mergeability is the point)."""
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.groupBy(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 2500).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("o_orderpriority")
    c = binned.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "total", F.sum("cnt").over(wtot)
    )

    def edge(p: int):
        return (
            F.min(F.when(100 * F.col("cum") >= p * F.col("total"), F.col("bin")))
            * 2500
        ).cast("double")

    return c.groupBy("o_orderpriority").agg(
        edge(50).alias("p50_edge"),
        edge(90).alias("p90_edge"),
        edge(99).alias("p99_edge"),
        F.max("total").cast("long").alias("n"),
    )


@register(
    "fuzzy_prefix_pairs",
    """
    WITH d0 AS (
      SELECT doc_id, lang, split_part(text, ' ', 1) AS w1,
             substr(text, 1, 32) AS p
      FROM documents
    ), ok_blocks AS (
      SELECT lang, w1 FROM d0 GROUP BY lang, w1 HAVING count(*) <= 1000
    ), d AS (
      SELECT d0.* FROM d0 JOIN ok_blocks USING (lang, w1)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.p, b.p) AS dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.w1 = b.w1 AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 14
    """,
)
def q_fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs share (lang, first token)
    — a hash-partitionable equi-join key — and survive if the Levenshtein
    distance of their 32-char prefixes is ≤ 14. The classic record-linkage
    shape: a cheap blocking key prunes the O(n²) pair space to
    O(Σ block²), then the expensive edit distance runs only inside
    blocks. Both engines share one edit-distance definition
    (unit-cost insert/delete/substitute), so dist is exact-integer
    comparable.

    At 100 TB the block key is the knob: (lang, first-token) here;
    real corpora would use a coarser LSH or length band. Formulation
    (r7 rewrite, 3.1 s → 0.84 s quiet at sf0.1): instead of a self-join
    — which scans the wide `text` column four times (d0 twice for the
    guard, then both join sides) and re-shuffles full rows — collect
    each block's (doc_id, prefix) members into one sorted array (ONE
    scan, ONE shuffle of 40-byte structs), generate the i<j pairs
    in-block with nested `transform` (pure codegen, no join), and run
    the bounded levenshtein post-explode. The mega-block guard
    (size ≤ 1000, same policy as the SimHash chunk guard) is enforced
    BEFORE any full block materializes (r8): members first collect
    into salted sub-lists — groupBy(lang, w1, doc_id % 64) — so one
    skewed block key lands as 64 bounded sub-arrays in 64 tasks, a
    window-sum over the tiny sub-aggregate rows computes the true
    block size, over-limit blocks are dropped THEN, and only surviving
    (≤ 1000-member) blocks flatten into a single sorted array. A naive
    collect_list-then-filter would have built the mega-block's full
    in-memory array inside one aggregation task before discarding it;
    dropped blocks remain the caller's signal to pick a finer key.
    The repartition before the explode spreads the O(block²)
    pair-generation compute across cores — without it AQE coalesces
    the tiny post-agg map side to one task and the CPU-bound
    levenshtein stage runs serially."""
    docs = load_table(spark, sf_dir, "documents")
    d0 = docs.select(
        "doc_id",
        "lang",
        F.substring_index("text", " ", 1).alias("w1"),
        F.substring("text", 1, 32).alias("p"),
    )
    sub = d0.groupBy(
        "lang", "w1", F.pmod("doc_id", F.lit(64)).alias("_salt")
    ).agg(
        F.collect_list(F.struct("doc_id", "p")).alias("sub"),
        F.count(F.lit(1)).alias("cnt"),
    )
    blocks = (
        sub.withColumn(
            "total", F.sum("cnt").over(Window.partitionBy("lang", "w1"))
        )
        .filter((F.col("total") >= 2) & (F.col("total") <= 1000))
        .groupBy("lang", "w1")
        .agg(F.sort_array(F.flatten(F.collect_list("sub"))).alias("m"))
    )
    pairs = blocks.repartition(spark.sparkContext.defaultParallelism).select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x.doc_id as doc_a, y.doc_id as doc_b, "
                    "x.p as pa, y.p as pb)))"
                )
            )
        ).alias("pr")
    )
    return pairs.select(
        F.col("pr.doc_a"),
        F.col("pr.doc_b"),
        # threshold form (Spark 3.5+): banded DP with early exit,
        # returns -1 above the bound — same kept set and same dist
        # values for kept rows as the unbounded form (verified
        # set-identical on 107k candidate pairs)
        F.levenshtein(F.col("pr.pa"), F.col("pr.pb"), 14).alias("dist"),
    ).filter(F.col("dist") >= 0)


@register(
    "lateral_top2_orders",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    """,
)
def q_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL-2016
    spelling of per-key top-k. Catalyst decorrelates it into an
    equi-join + per-key ranking (verified: the probe plan shows a
    BroadcastHashJoin on c_custkey, no nested-loop re-execution per
    customer row), so it scales like any join + window, not like a
    per-row subquery. Tie-break on o_orderkey keeps both engines
    deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_ord")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM lat_cust c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM lat_ord o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        """
    )


@register(
    "recursive_customer_tree_depth",
    """
    WITH RECURSIVE chain AS (
      SELECT c_custkey, CAST(0 AS BIGINT) AS depth FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, chain.depth + 1
      FROM customer c JOIN chain
        ON CAST(floor(c.c_custkey / 2) AS BIGINT) = chain.c_custkey
    )
    SELECT depth, count(*) AS n FROM chain GROUP BY depth
    """,
)
def q_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) traversing the implicit binary tree
    custkey → floor(custkey/2): per-depth node counts. Exercises the
    engine's iterative-union executor; DuckDB runs the identical SQL.

    Scale note: each recursion step is a full join against the base
    table, and the unified intermediate grows with depth — fine for
    O(log n)-deep hierarchies like this (depth ≈ log2(customers)); for
    deep/unbounded graph reachability use
    operators.dedup.connected_components, which localCheckpoints each
    frontier (bounded lineage) and early-terminates."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("rec_cust")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, CAST(0 AS BIGINT) AS depth
          FROM rec_cust WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, chain.depth + 1
          FROM rec_cust c JOIN chain
            ON CAST(floor(c.c_custkey / 2) AS BIGINT) = chain.c_custkey
        )
        SELECT depth, count(*) AS n FROM chain GROUP BY depth
        """
    )


#: weak-label threshold calibrated to the SYNTHETIC corpus: its
#: dup-bigram ratio maxes at 0.13 (the literature's 0.2 never fires →
#: constant label → degenerate LBFGS), so label near the p90 — ~10%
#: positive at every shipped SF, a real two-class problem.
_QUALITY_LABEL_THRESHOLD = 0.065


@register(
    "quality_classifier_scores",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_scored,
      CAST(1 AS BIGINT) AS agreement_ge_080
    FROM documents
    """,
)
def q_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-label quality classifier over the documents table: heuristic
    repetition rule labels (corpus-calibrated threshold — see
    _QUALITY_LABEL_THRESHOLD), LogisticRegression fit (distributed
    LBFGS), then scoring as a pure JVM sigmoid expression
    (operators/models.py). SEMI-ORACLED (r9, VERDICT r8 #5): iterative
    LBFGS isn't SQL-expressible, so the emitted row is a CERTIFICATE —
    n_scored (every doc scored, the oracle counts the table) and
    agreement_ge_080 (the trained model's 0.5-threshold prediction
    agrees with its own weak training labels on ≥80% of docs;
    deterministic given LBFGS-from-zero on fixed data — measured
    0.910/0.896/0.903 at sf0.001/0.01/0.1, a ~0.1 margin). A training or
    scoring regression flips the flag and fails the value-hash. The
    per-doc scores stay available via operators/models.score_quality;
    the frozen-coefficient serving path is fully oracled as
    `quality_logit_frozen`."""
    from ..operators.models import (
        quality_feature_frame,
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(
        docs, label_threshold=_QUALITY_LABEL_THRESHOLD
    ).persist()
    try:
        model = train_quality_classifier(feats, max_iter=15)
    finally:
        feats.unpersist()
    scored = score_quality(
        docs, model, label_threshold=_QUALITY_LABEL_THRESHOLD
    )
    agree = (
        (F.col("p_low_quality") > 0.5).cast("int") == F.col("weak_label")
    ).cast("double")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        (F.avg(agree) >= 0.8).cast("bigint").alias("agreement_ge_080"),
    )


def _frozen_quality_oracle() -> str:
    """DuckDB replica of the frozen-coefficient quality filter: the
    identical feature arithmetic (exact integer-ratio doubles) and the
    identical left-to-right logit chain, literal-for-literal."""
    from ..operators.models import FROZEN_COEFS, FROZEN_INTERCEPT
    from ..operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    c_dtr, c_tts, c_nt, c_swr = (repr(c) for c in FROZEN_COEFS)
    z = (
        f"{FROZEN_INTERCEPT!r} + {c_dtr} * dtr + {c_tts} * tts"
        f" + {c_nt} * n_tok + {c_swr} * swr"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id,
      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
      CAST(list_max(list_transform(list_distinct(toks),
        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks) AS tts,
      CAST(len(toks) AS DOUBLE) AS n_tok,
      CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) AS swr
    FROM t)
    SELECT doc_id, round({z}, 6) AS logit,
      CAST(({z}) > 0 AS BIGINT) AS flag_low_quality
    FROM f
    """


@register("quality_logit_frozen", _frozen_quality_oracle())
def q_quality_logit_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality classifier's SERVING path with the model frozen as
    literals (operators/models.py FROZEN_COEFS): one scan, features and
    logit all inside whole-stage codegen — at 100 TB the corpus-wide
    quality filter costs the same as an arithmetic projection, and the
    deployed model version is pinned in code, not in a model store.
    Emits the logit rather than the sigmoid: add/multiply are IEEE
    bit-deterministic across engines while exp() is not, and sigmoid
    monotonicity makes logit thresholds equivalent — so this path is
    fully DuckDB-oracle-able where the trained twin
    (`quality_classifier_scores`) is rows-only."""
    from ..operators.models import frozen_logit_expr, quality_feature_frame

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(docs)
    z = frozen_logit_expr()
    return feats.select(
        "doc_id",
        F.round(z, 6).alias("logit"),
        (z > 0).cast("bigint").alias("flag_low_quality"),
    )


def _rp_oracle() -> str:
    """DuckDB replica of the 8-plane random projection: identical
    blake2b-derived literal weights, identical sequential dot order
    (list_dot_product folds left like Spark's aggregate)."""
    from ..functions.vectors import plane_weight

    comps = []
    for p in range(8):
        w = ", ".join(repr(plane_weight(p, d)) for d in range(64))
        comps.append(
            f"round(list_dot_product(embedding::DOUBLE[], [{w}]) / sqrt(8.0), 6) AS r{p}"
        )
    return (
        "SELECT vec_id, " + ", ".join(comps) + " FROM embeddings"
    )


@register("embedding_random_projection", _rp_oracle())
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64-dim → 8-dim: each
    component is v · r_p / sqrt(k) over a deterministic blake2b-derived
    plane (functions/vectors.py:plane_weight — zero driver state, no
    RNG, so retries/speculative tasks project identically and the
    oracle embeds the same literals).

    The projection is a narrow per-row map — no shuffle, stays in
    whole-stage codegen — and is the standard pre-step that makes
    downstream ANN / clustering / dedup distance math 8× cheaper while
    approximately preserving pairwise distances. Composes directly with
    ann_* queries by swapping the embedding column for the projected
    one."""
    from ..functions.vectors import plane_dots

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    )
    proj = emb.withColumn("pd", plane_dots("v", 8, n_dims=64))
    return proj.select(
        "vec_id",
        *[
            F.round(F.expr(f"element_at(pd, {p + 1})") / F.sqrt(F.lit(8.0)), 6).alias(
                f"r{p}"
            )
            for p in range(8)
        ],
    )


def _hll_oracle() -> str:
    from ..operators.sketches import hll_estimate_oracle_sql

    return hll_estimate_oracle_sql("events", "event_type", "user_id")


@register("hll_distinct_portable", _hll_oracle())
def q_hll_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct-user HLL whose ESTIMATE the oracle reproduces
    exactly — unlike approx_count_distinct (opaque JVM sketch, rows-only
    check), the md5-register construction and the exact-integer harmonic
    denominator (Σ 2^(rho_max−rho), a bigint — immune to fp
    summation-order divergence) are engine-portable, so sketch MERGE
    semantics themselves are under the correctness gate. Shuffle carries
    ≤256 registers per (group, partition) no matter the input size."""
    from ..operators.sketches import hll_estimate

    ev = load_table(spark, sf_dir, "events")
    return hll_estimate(ev, "event_type", "user_id")


@register(
    "incremental_ingest_dedup",
    """
    WITH incoming AS (
      SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 5 = 0
    ), existing AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 5 <> 0
    ), fresh AS (
      SELECT i.doc_id, i.digest FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.digest = i.digest)
    )
    SELECT min(doc_id) AS doc_id, digest, count(*) AS n_copies_in_batch
    FROM fresh GROUP BY digest
    """,
)
def q_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental exact dedup — the nightly-ingest shape: an
    incoming batch (doc_id % 5 = 0 stands in for the new partition) is
    deduped against the existing corpus by content digest (LEFT ANTI on
    md5 — 32-byte shuffle keys, payloads never move) and then within
    itself (keep the lowest doc_id per digest). At 100 TB the existing
    side is a digest-only column scan, and in production the anti-join
    probe side would be further pruned by a digest bloom/index; the
    plan here is the same two-exchange shape either way."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("digest")
    )
    existing = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.md5("text").alias("digest")
    )
    fresh = incoming.join(existing, "digest", "left_anti")
    return fresh.groupBy("digest").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies_in_batch"),
    ).select("doc_id", "digest", "n_copies_in_batch")


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
           AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-table join: fact lineitem against two
    independent dimension chains (customer→orders and supplier), closed
    by the c_nationkey = s_nationkey equality and the region filter.
    Exact decimal intermediates surfaced as doubles (the q1 recipe, so
    partial-agg combine order can't move the result).

    Scale shape: the region→nation→supplier chain and customer are
    broadcast-sized after the 'ASIA' filter prunes 4/5 of nations;
    Catalyst pushes the o_orderdate range to the orders scan
    (PushedFilters) so the only big shuffle is lineitem↔orders on
    orderkey. AQE reorders/broadcasts from runtime sizes — exactly the
    plan a hand-tuned 100 TB run wants."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec2, dec4 = "decimal(18,2)", "decimal(8,4)"
    rev = F.col("l_extendedprice").cast(dec2) * (
        F.lit(1).cast(dec4) - F.col("l_discount").cast(dec4)
    )
    joined = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue")
    )


@register(
    "domain_cap_sample_scale",
    """
    WITH keyed AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 16 AS salt
      FROM documents
    ), local AS (
      SELECT doc_id, source, h FROM (
        SELECT doc_id, source, h,
          row_number() OVER (PARTITION BY source, salt ORDER BY h, doc_id) AS lrn
        FROM keyed) WHERE lrn <= 10
    )
    SELECT doc_id, source, rn FROM (
      SELECT doc_id, source,
        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      FROM local) WHERE rn <= 10
    """,
)
def q_domain_cap_sample_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of domain_cap_sample: two-phase top-K. Phase 1
    ranks within (source, salt) — salt = md5-derived, 16-way — so a
    mega-domain's sort splits across 16 keys instead of serializing on
    one; phase 2 ranks the ≤16·K survivors per source. Correct because
    every member of a source's global top-K is in its salt's local
    top-K; deterministic (content-derived salt — no partition-layout
    dependence, retry-stable) and therefore fully oracled, unlike a
    spark_partition_id-salted variant. Equality with the single-window
    form is asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn(
        "salt",
        F.expr("CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % 16"),
    )
    wl = Window.partitionBy("source", "salt").orderBy("h", "doc_id")
    local = (
        keyed.withColumn("lrn", F.row_number().over(wl))
        .filter(F.col("lrn") <= 10)
        .drop("lrn", "salt")
    )
    wg = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        local.withColumn("rn", F.row_number().over(wg).cast("long"))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source", "rn")
    )


def _calibration_oracle() -> str:
    """Label rule + frozen logit + integer binning, all replayed: the
    _frozen_quality_oracle feature CTE extended with the dup-bigram
    weak label (threshold per _QUALITY_LABEL_THRESHOLD)."""
    from ..operators.models import FROZEN_COEFS, FROZEN_INTERCEPT
    from ..operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    c_dtr, c_tts, c_nt, c_swr = (repr(c) for c in FROZEN_COEFS)
    z = (
        f"{FROZEN_INTERCEPT!r} + {c_dtr} * dtr + {c_tts} * tts"
        f" + {c_nt} * n_tok + {c_swr} * swr"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id, toks,
      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
      CAST(list_max(list_transform(list_distinct(toks),
        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks) AS tts,
      CAST(len(toks) AS DOUBLE) AS n_tok,
      CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) AS swr
    FROM t),
    lab AS (SELECT doc_id, dtr, tts, n_tok, swr,
      CASE WHEN len(toks) < 2 THEN 0.0 ELSE
        1.0 - CAST(len(list_distinct(list_transform(
          generate_series(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
          / (len(toks) - 1) END > {_QUALITY_LABEL_THRESHOLD} AS weak_label
    FROM f)
    SELECT least(greatest(CAST(floor({z}) AS BIGINT), -8), 3) AS logit_bin,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN weak_label THEN 1 ELSE 0 END) AS BIGINT)
        AS n_low_quality_label,
      CAST(sum(CASE WHEN ({z}) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM lab GROUP BY 1
    """


@register("quality_calibration_bins", _calibration_oracle())
def q_quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability report for the frozen quality filter:
    documents bucketed by integer logit bin (floor(z), clamped to
    [-8, 3]), each bin reporting row count, weak-label positives (the
    Gopher dup-bigram rule the classifier was trained on), and
    flagged count — the classifier-QA table that shows whether the
    label rate actually rises with the score before anyone trusts the
    threshold at 100 TB. All counts exact integers; the bin edges are
    floor() of the IEEE-identical logit chain, so binning is
    engine-stable (the quality_logit_frozen determinism argument).

    Scale shape: one scan computes features, label, logit, and bin in
    a single codegen'd projection; one ≤12-group hash aggregate."""
    from ..operators.models import frozen_logit_expr, quality_feature_frame

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(
        docs, label_threshold=_QUALITY_LABEL_THRESHOLD
    )
    z = frozen_logit_expr()
    binned = feats.select(
        F.least(
            F.greatest(F.floor(z).cast("bigint"), F.lit(-8)), F.lit(3)
        ).alias("logit_bin"),
        "weak_label",
        (z > 0).cast("int").alias("flagged"),
    )
    return binned.groupBy("logit_bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("weak_label").cast("bigint")).alias(
            "n_low_quality_label"
        ),
        F.sum("flagged").cast("bigint").alias("n_flagged"),
    )


def _auc_oracle() -> str:
    """Label rule + frozen logit replayed (the _calibration_oracle
    CTEs), then the tie-aware Mann-Whitney AUC in exact integer
    arithmetic: group by distinct logit, running negative count in
    score order (distinct keys, so RANGE vs ROWS framing is moot),
    u2 = sum(pos * (2*neg_below + neg)). HUGEINT sums cast to BIGINT
    per the repo type-hop convention (queries.py:6-11)."""
    from ..operators.models import FROZEN_COEFS, FROZEN_INTERCEPT
    from ..operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    c_dtr, c_tts, c_nt, c_swr = (repr(c) for c in FROZEN_COEFS)
    z = (
        f"{FROZEN_INTERCEPT!r} + {c_dtr} * dtr + {c_tts} * tts"
        f" + {c_nt} * n_tok + {c_swr} * swr"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id, toks,
      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
      CAST(list_max(list_transform(list_distinct(toks),
        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks) AS tts,
      CAST(len(toks) AS DOUBLE) AS n_tok,
      CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) AS swr
    FROM t),
    lab AS (SELECT {z} AS s,
      CASE WHEN (CASE WHEN len(toks) < 2 THEN 0.0 ELSE
        1.0 - CAST(len(list_distinct(list_transform(
          generate_series(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
          / (len(toks) - 1) END) > {_QUALITY_LABEL_THRESHOLD}
        THEN 1 ELSE 0 END AS pos
    FROM f),
    g AS (SELECT s, count(*) AS cnt, sum(pos) AS pos
          FROM lab GROUP BY s),
    c AS (SELECT pos, cnt - pos AS neg,
      sum(cnt - pos) OVER (ORDER BY s) - (cnt - pos) AS neg_before
    FROM g)
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(pos * (2 * neg_before + neg)) AS BIGINT) AS u2,
           CASE WHEN sum(pos) = 0 OR sum(neg) = 0 THEN NULL
                ELSE round(CAST(sum(pos * (2 * neg_before + neg)) AS DOUBLE)
                     / (2.0 * CAST(sum(pos) AS DOUBLE)
                        * CAST(sum(neg) AS DOUBLE)), 9)
           END AS auc
    FROM c
    """


@register("classifier_auc_exact", _auc_oracle())
def q_classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC of the frozen quality classifier against
    its weak labels — the ranking-quality complement of the calibration
    report (quality_calibration_bins answers "is p calibrated?", this
    answers "does the score order low-quality above high-quality at
    all?"). An AUC you can trust at 100 TB must be EXACT, not sampled:
    a 0.01 AUC shift on a corpus-wide filter moves billions of tokens
    across the keep/drop line.

    Scale shape: one scan computes features, label, and logit in a
    single codegen'd projection; operators/ranking.exact_auc turns the
    O(n_pos x n_neg) pair semantics into one score-keyed groupBy + a
    range-partitioned running sum (no single-partition window) + a
    1-row reduce. u2 is an exact integer on both engines; the only
    float op is one correctly-rounded division."""
    from ..operators.models import frozen_logit_expr, quality_feature_frame
    from ..operators.ranking import exact_auc

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(
        docs, label_threshold=_QUALITY_LABEL_THRESHOLD
    )
    scored = feats.select(
        frozen_logit_expr().alias("s"), F.col("weak_label").alias("y")
    )
    return exact_auc(scored, "s", "y")


_CUPED_BOUNDARY = "2024-01-16 00:00:00"


@register(
    "ab_test_cuped",
    f"""
    WITH u AS (
      SELECT user_id,
        sum(CASE WHEN ts < TIMESTAMP '{_CUPED_BOUNDARY}'
                 THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS x,
        sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_BOUNDARY}'
                 THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS y
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
        CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
        CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
        CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy
      FROM u
    ),
    t AS (
      SELECT n, sx / n AS xbar,
        (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta
      FROM p
    ),
    v AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS variant,
        CAST(count(*) AS BIGINT) AS n_users,
        CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx_v,
        CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy_v
      FROM u GROUP BY 1
    )
    SELECT variant, n_users,
      round(sy_v / n_users, 6) AS mean_post,
      round((sy_v - theta * (sx_v - n_users * xbar)) / n_users, 6)
        AS mean_post_adj,
      round(theta, 6) AS theta
    FROM v, t
    """,
)
def q_ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout with CUPED variance reduction: users split
    50/50 into variants by md5 (the deterministic assignment every
    other sampler here uses), post-period mean value per variant plus
    the CUPED-adjusted mean — y_i − θ·(x_i − x̄) with θ = cov(x,y)/
    var(x) over the pooled pre-period covariate. The adjusted means
    close over per-VARIANT sums (Σy_v − θ·(Σx_v − n_v·x̄)), so no
    per-user second pass exists at all.

    Float discipline (NOTES.md): per-user pre/post sums and the pooled
    moments are DECIMAL(18,6) partial sums (associative — partition-
    order-proof); the VARCHAR→DOUBLE hop yields identical operands in
    both engines, and θ / x̄ / the adjusted means are FIXED left-to-
    right IEEE chains written identically in both dialects.

    Scale shape: one scan → per-user conditional decimal sums (the
    ONLY corpus-keyed exchange, map-side partials), then two tiny
    aggregates (2 variant rows; 1 pooled row broadcast back). The
    experiment readout of a 100 TB event ledger costs one user-keyed
    shuffle of two decimals."""
    ev = load_table(spark, sf_dir, "events")
    b = F.lit(_CUPED_BOUNDARY).cast("timestamp")
    dec0 = F.lit(0).cast("decimal(18,6)")
    vdec = F.col("value").cast("decimal(18,6)")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < b, vdec).otherwise(dec0)).alias("x"),
        F.sum(F.when(F.col("ts") >= b, vdec).otherwise(dec0)).alias("y"),
    )
    p = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("string").cast("double").alias("sx"),
        F.sum("y").cast("string").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("string").cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("string").cast("double").alias("sxy"),
    )
    t = p.select(
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
    )
    v = u.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        ).otherwise("B"),
    ).groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("string").cast("double").alias("sx_v"),
        F.sum("y").cast("string").cast("double").alias("sy_v"),
    )
    return v.crossJoin(F.broadcast(t)).select(
        "variant",
        "n_users",
        F.round(F.col("sy_v") / F.col("n_users"), 6).alias("mean_post"),
        F.round(
            (
                F.col("sy_v")
                - F.col("theta")
                * (F.col("sx_v") - F.col("n_users") * F.col("xbar"))
            )
            / F.col("n_users"),
            6,
        ).alias("mean_post_adj"),
        F.round("theta", 6).alias("theta"),
    )


@register(
    "anomaly_mad_events",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
      round((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    WHERE abs((e.value - m.med) / (1.4826 * d.mad)) > 3.5
    """,
)
def q_anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging per event_type: |x − median| / (1.4826 ·
    MAD) > 3.5 — the Hampel/median-absolute-deviation rule that, unlike
    the mean/std z-score (anomaly_zscore_events), is not itself dragged
    by the outliers it hunts. On heavy-tailed telemetry the z-score's
    own sigma inflates and masks anomalies; MAD's 50% breakdown point
    doesn't.

    Float parity: percentile ≡ quantile_cont (both linearly
    interpolate: (a+b)/2-style IEEE chains on identical operands — the
    percentiles_exact precedent), and the robust z is one FIXED
    division chain with the 1.4826 consistency constant written
    literally in both dialects.

    Scale shape: two per-type aggregates (exact medians need a
    per-type sort — at 100 TB you'd swap percentile for the t-digest
    twin, same plan shape) over ≤ |types| groups, each broadcast back
    onto the fact scan; the flag filter is a narrow projection. No
    corpus-wide window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    rz = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > 3.5)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(rz, 6).alias("robust_z"),
        )
    )


@register(
    "funnel_latency_percentiles",
    """
    WITH u1 AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ), u2 AS (
      SELECT e.user_id, t1,
        min(CASE WHEN e.event_type = 'click' AND e.ts > t1 THEN e.ts END) AS t2
      FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id, t1
    ), u3 AS (
      SELECT e.user_id, t1, t2,
        min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2 THEN e.ts END) AS t3
      FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id, t1, t2
    ),
    d AS (
      SELECT 'view_to_click' AS stage,
             CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE) AS d_us
      FROM u3 WHERE t2 IS NOT NULL
      UNION ALL
      SELECT 'click_to_purchase',
             CAST(epoch_us(t3) - epoch_us(t2) AS DOUBLE)
      FROM u3 WHERE t3 IS NOT NULL
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users,
      round(quantile_cont(d_us, 0.5) / 1000000, 6) AS p50_s,
      round(quantile_cont(d_us, 0.9) / 1000000, 6) AS p90_s
    FROM d GROUP BY stage
    """,
)
def q_funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-LATENCY distribution for the ordered funnel — the
    time-to-convert complement of event_funnel_stages (which reports
    stage reach only): per-user first-view → first-later-click →
    first-later-purchase deltas, p50/p90 per stage pair in seconds.
    The product-analytics number behind "how long does conversion
    take", and the regression alarm when a release slows it.

    Parity: stage timestamps are micro-precision on both engines
    (load_table truncates nanos → micros exactly like DuckDB's
    TIMESTAMP read), deltas are exact integer micros cast to double,
    and percentile ≡ quantile_cont interpolation on identical operand
    sets (the percentiles_exact precedent).

    Scale shape: the three conditional-min windows share ONE
    partitionBy(user_id) spec — a single user-keyed exchange, same as
    event_funnel_stages — then the percentile aggregate runs over ≤ 2
    rows per user. Exact percentiles imply a per-stage sort of
    |converting users| deltas; at 100 TB swap in the t-digest twin,
    same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.first("t2").alias("t2"),
            F.first("t3").alias("t3"),
        )
    )
    d12 = df.filter(F.col("t2").isNotNull()).select(
        F.lit("view_to_click").alias("stage"),
        (F.unix_micros("t2") - F.unix_micros("t1"))
        .cast("double")
        .alias("d_us"),
    )
    d23 = df.filter(F.col("t3").isNotNull()).select(
        F.lit("click_to_purchase").alias("stage"),
        (F.unix_micros("t3") - F.unix_micros("t2"))
        .cast("double")
        .alias("d_us"),
    )
    return (
        d12.unionByName(d23)
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.expr("percentile(d_us, 0.5)") / 1000000, 6).alias(
                "p50_s"
            ),
            F.round(F.expr("percentile(d_us, 0.9)") / 1000000, 6).alias(
                "p90_s"
            ),
        )
    )


@register(
    "dau_wau_stickiness",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
    cover AS (
      SELECT CAST(du.d + INTERVAL (i) DAY AS DATE) AS wd, du.user_id
      FROM du, range(0, 7) r(i)
    ),
    wau AS (
      SELECT wd AS d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM cover GROUP BY wd
    )
    SELECT dau.d, dau.dau, wau.wau,
      round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau USING (d)
    """,
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio product teams
    watch (what fraction of the week's actives showed up today), with
    the WAU an EXACT trailing-7-day distinct count. Exact sliding
    distincts don't compose from daily distincts (users overlap), so
    each (user, day) active-pair is exploded onto the ≤ 7 future days
    whose trailing window it covers, then one distinct-count per day —
    turning the sliding window into a plain keyed aggregate.

    Only days with actual activity are emitted (inner join dau⋈wau):
    a silent day has no DAU row — and the fixture has none silent.
    Trailing windows at the series head are partial by definition.

    Scale shape: the explode is a bounded ×7 row multiplier on the
    DISTINCT (user, day) pairs (already collapsed from raw events —
    the multiplier applies post-dedup), then two hash aggregates. At
    100 TB the same shape holds with the window length as the
    multiplier; for long windows swap the HLL-register twin
    (hll_distinct_merge_by_source pattern) — same plan, sketch rows."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cover = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        F.col("d"),
        "user_id",
    ).select(F.date_add("d", F.col("i")).alias("d"), "user_id")
    wau = cover.groupBy("d").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "d").select(
        "d",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "revenue_gini_concentration",
    """
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x ASC, o_custkey ASC) AS i,
             count(*) OVER () AS n
      FROM rev
    ),
    s AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
        sum(CAST(i AS DECIMAL(38,6)) * x) AS s_ix,
        sum(x) AS s_x,
        sum(CASE WHEN i > n - n // 10
                 THEN x ELSE CAST(0 AS DECIMAL(18,6)) END) AS s_top
      FROM ranked
    )
    SELECT n AS n_customers,
      round(2 * CAST(CAST(s_ix AS VARCHAR) AS DOUBLE)
            / (n * CAST(CAST(s_x AS VARCHAR) AS DOUBLE))
            - CAST(n + 1 AS DOUBLE) / n, 6) AS gini,
      round(CAST(CAST(s_top AS VARCHAR) AS DOUBLE)
            / CAST(CAST(s_x AS VARCHAR) AS DOUBLE), 6) AS top10_share
    FROM s
    """,
)
def q_revenue_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Gini coefficient of per-customer
    revenue (G = 2Σi·x₍ᵢ₎/(nΣx) − (n+1)/n over ascending-sorted
    revenues) plus the top-decile share — the whale-dependence report
    behind pricing and risk reviews, and the data-mixture analogue of
    "how skewed is my corpus toward a few domains".

    Float discipline: revenues are DECIMAL(18,6) sums, the rank-
    weighted sum Σi·x is decimal × integer (exact), and the two
    divisions + one subtraction are a fixed IEEE chain over
    VARCHAR-hopped identical operands.

    Scale shape: per-customer aggregate (one keyed exchange), then the
    global ascending rank via the two-pass range-partitioned
    row-number (operators/ranking.py:global_row_number — per-partition
    sort + broadcast triangular offsets, NO single-partition window),
    then a 1-row reduce. The oracle's OVER () windows are the SQL
    spelling, not the plan."""
    from ..operators.ranking import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("x")
    )
    ranked = global_row_number(rev, ["x", "o_custkey"], rn_col="i")
    thresh = F.col("_total_n") - (F.col("_total_n") / 10).cast("long")
    s = ranked.agg(
        F.max("_total_n").cast("long").alias("n"),
        F.sum(F.col("i").cast("decimal(38,6)") * F.col("x")).alias("s_ix"),
        F.sum("x").alias("s_x"),
        F.sum(
            F.when(F.col("i") > thresh, F.col("x")).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        ).alias("s_top"),
    )
    n = F.col("n")
    gini = F.round(
        2 * F.col("s_ix").cast("string").cast("double")
        / (n * F.col("s_x").cast("string").cast("double"))
        - (n + 1).cast("double") / n,
        6,
    )
    return s.select(
        n.alias("n_customers"),
        gini.alias("gini"),
        F.round(
            F.col("s_top").cast("string").cast("double")
            / F.col("s_x").cast("string").cast("double"),
            6,
        ).alias("top10_share"),
    )


@register(
    "ltv_cohort_curves",
    """
    WITH fo AS (
      SELECT o_custkey,
             date_trunc('month', min(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cust FROM fo GROUP BY cohort),
    r AS (
      SELECT fo.cohort,
        CAST(datediff('month', fo.cohort,
                      date_trunc('month', o.o_orderdate)) AS BIGINT) AS m,
        sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    c AS (
      SELECT cohort, m,
        sum(rev) OVER (PARTITION BY cohort ORDER BY m
                       ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM r
    )
    SELECT CAST(c.cohort AS TIMESTAMP) AS cohort, m,
      round(CAST(CAST(cum_rev AS VARCHAR) AS DOUBLE) / n_cust, 6)
        AS cum_ltv_per_customer
    FROM c JOIN cs USING (cohort)
    """,
)
def q_ltv_cohort_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves by acquisition cohort: for each
    first-order month and months-since-acquisition m, the CUMULATIVE
    revenue per cohort customer — the retention-economics table behind
    payback-period decisions, and the revenue-weighted complement of
    retention_cohort_weeks (which counts activity only).

    Float discipline: per-(cohort, m) revenue is a DECIMAL(18,6) sum;
    the cumulative sum runs over DECIMALS (associative) inside a
    cohort-partitioned window ORDERED BY m — partitions are bounded by
    the month span (≤ ~100 rows), never corpus-sized; the single
    VARCHAR→DOUBLE hop happens after the cumsum, then one division.

    Scale shape: first-order aggregate (one customer-keyed exchange),
    revenue rollup joins orders back to cohorts on the customer key
    (second keyed exchange), then the tiny windowed cumsum over
    |cohorts|×|months| rows. At 100 TB both exchanges are plain
    hash-partitioned fact joins/aggs."""
    orders = load_table(spark, sf_dir, "orders")
    fo = orders.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate").cast("date"), "MM").alias("cohort")
    )
    cs = fo.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust")
    )
    r = (
        orders.join(fo, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.trunc(F.col("o_orderdate").cast("date"), "MM"),
                F.col("cohort"),
            )
            .cast("long")
            .alias("m"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = r.withColumn("cum_rev", F.sum("rev").over(w))
    return c.join(F.broadcast(cs), "cohort").select(
        F.col("cohort").cast("timestamp").alias("cohort"),
        "m",
        F.round(
            F.col("cum_rev").cast("string").cast("double") / F.col("n_cust"),
            6,
        ).alias("cum_ltv_per_customer"),
    )


@register(
    "top_event_paths_3step",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3,
        lead(ts, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type AS e1, e2, e3 FROM ordered
      WHERE e3 IS NOT NULL
        AND epoch_us(t3) - epoch_us(ts) <= 1800 * 1000000
    ),
    counts AS (
      SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n FROM paths
      GROUP BY 1, 2, 3
    )
    SELECT e1, e2, e3, n,
      CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS BIGINT)
        AS rank
    FROM counts QUALIFY rank <= 5
    """,
)
def q_top_event_paths_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 5 most common 3-step event sequences
    completed within 30 minutes — the behavioral-flow report behind
    "what do users actually do", one step deeper than the first-order
    event_transition_matrix (ordered TRIPLES, time-bounded, so
    cross-session junk paths are excluded). Tie-broken
    (count desc, path asc) for a deterministic cut.

    Scale shape: two leads over ONE user-keyed window spec (single
    exchange, same as the funnel), a (e1,e2,e3) hash aggregate over
    ≤ |types|³ groups, then rank over that tiny table — the final
    row_number window runs on ≤ 125 rows, never the corpus. The
    (ts, event_id) window order is a total order, so lead() is
    deterministic under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("e1"),
        F.col("ts"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("t3"),
    )
    paths = o.filter(
        F.col("e3").isNotNull()
        & (
            F.unix_micros("t3") - F.unix_micros("ts")
            <= 1800 * 1_000_000
        )
    )
    counts = paths.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w2 = Window.orderBy(F.desc("n"), "e1", "e2", "e3")
    return (
        counts.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= 5)
    )


@register(
    "seasonal_naive_backtest",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.h, a.n AS actual, f.n AS forecast
      FROM hourly a JOIN hourly f
        ON f.event_type = a.event_type
       AND f.h = a.h - INTERVAL 168 HOUR
    )
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_hours,
      CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err,
      round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*), 6)
        AS mae,
      round(CAST(sum(abs(actual - forecast)) AS DOUBLE)
            / sum(actual), 6) AS wape
    FROM j GROUP BY event_type
    """,
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest: the seasonal-naive model (this
    hour's volume = same hour last week) scored with MAE and WAPE per
    event type — the floor every capacity-planning forecast must beat,
    and the drift alarm when traffic rhythm changes (WAPE jumps).
    Integer hourly counts, integer absolute errors; the only doubles
    are two final divisions.

    Scale shape: one (type, hour) aggregate with map-side partials
    (the ONLY corpus-wide exchange), then a self-equi-join of the tiny
    hourly table on (type, hour−168h) and a ≤ |types|-group rollup. At
    100 TB the hourly table is |types|·|hours| rows — the self-join
    never touches raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    f = hourly.select(
        F.col("event_type"),
        (F.col("h") + F.expr("INTERVAL 168 HOURS")).alias("h"),
        F.col("n").alias("forecast"),
    )
    j = hourly.withColumnRenamed("n", "actual").join(
        f, ["event_type", "h"]
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(err).cast("long").alias("sum_abs_err"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6).alias(
            "mae"
        ),
        F.round(F.sum(err).cast("double") / F.sum("actual"), 6).alias(
            "wape"
        ),
    )


@register(
    "chi_square_independence",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, dow, n,
        CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
        CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS col_tot,
        CAST(sum(n) OVER () AS BIGINT) AS big_n
      FROM cells
    )
    SELECT
      CAST(max(big_n) AS BIGINT) AS n_events,
      CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows_levels,
      CAST(count(DISTINCT dow) AS BIGINT) AS n_col_levels,
      CAST((count(DISTINCT event_type) - 1)
           * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
      round(sum(CAST(floor(
        (n - CAST(row_tot AS DOUBLE) * col_tot / big_n)
        * (n - CAST(row_tot AS DOUBLE) * col_tot / big_n)
        / (CAST(row_tot AS DOUBLE) * col_tot / big_n)
        * 1000000) AS BIGINT)) / 1e6, 6) AS chi2,
      round(sqrt(
        (sum(CAST(floor(
          (n - CAST(row_tot AS DOUBLE) * col_tot / big_n)
          * (n - CAST(row_tot AS DOUBLE) * col_tot / big_n)
          / (CAST(row_tot AS DOUBLE) * col_tot / big_n)
          * 1000000) AS BIGINT)) / 1e6)
        / (max(big_n)
           * (least(count(DISTINCT event_type),
                    count(DISTINCT dow)) - 1))
      ), 6) AS cramers_v
    FROM m
    """,
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and
    day-of-week — the standard "is traffic mix stable across the week"
    data-quality check, with Cramér's V as the effect size (chi2 alone
    grows with N; V is comparable across table sizes). Cells absent
    from the data contribute nothing on either engine (observed 0 with
    expected>0 would, but an absent (type,dow) cell never materializes
    in a GROUP BY on both sides — the statistic is over REALIZED cells,
    documented and mirrored exactly in the oracle).

    Scale shape: one corpus-wide (type,dow) hash aggregate with
    map-side partials — the only exchange. The contingency table is
    ≤ |types|·7 rows; the three marginal windows and the final 1-row
    rollup all run on that tiny table. dayofweek is timezone-pinned by
    the session (UTC), matching DuckDB's dayofweek(ts)+1 convention
    (DuckDB Sunday=0, Spark Sunday=1)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = (
        cells.withColumn(
            "row_tot",
            F.sum("n").over(Window.partitionBy("event_type")).cast("long"),
        )
        .withColumn(
            "col_tot",
            F.sum("n").over(Window.partitionBy("dow")).cast("long"),
        )
        .withColumn(
            "big_n",
            F.sum("n")
            .over(Window.partitionBy(F.lit(1)))
            .cast("long"),
        )
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("big_n")
    # fixed-point per-cell term (floor(term·1e6) as BIGINT): the term is
    # pure IEEE arithmetic on integer marginals — bit-identical in any
    # engine — so the quantized SUM is associative and order-stable
    # (ra_fp/_MV_FIX discipline), unlike a raw double sum
    term_fp = F.floor(
        (F.col("n") - exp) * (F.col("n") - exp) / exp * F.lit(1000000)
    ).cast("bigint")
    chi2 = F.sum(term_fp) / F.lit(1e6)
    r_lv = F.countDistinct("event_type")
    c_lv = F.countDistinct("dow")
    return m.agg(
        F.max("big_n").cast("long").alias("n_events"),
        r_lv.cast("long").alias("n_rows_levels"),
        c_lv.cast("long").alias("n_col_levels"),
        ((r_lv - 1) * (c_lv - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2 / (F.max("big_n") * (F.least(r_lv, c_lv) - F.lit(1)))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "ks_two_sample_sources",
    """
    WITH pc AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM pc GROUP BY 1
    ),
    grid AS (SELECT DISTINCT v FROM pc),
    cum AS (
      SELECT s.source, g.v,
        CAST(sum(coalesce(pc.c, 0))
             OVER (PARTITION BY s.source ORDER BY g.v) AS BIGINT) AS cc
      FROM (SELECT DISTINCT source FROM pc) s
      CROSS JOIN grid g
      LEFT JOIN pc ON pc.source = s.source AND pc.v = g.v
    )
    SELECT a.source AS source_a, b.source AS source_b,
      CAST(max(ta.n) AS BIGINT) AS n_a,
      CAST(max(tb.n) AS BIGINT) AS n_b,
      CAST(max(abs(a.cc * tb.n - b.cc * ta.n)) AS BIGINT) AS ks_num,
      round(CAST(max(abs(a.cc * tb.n - b.cc * ta.n)) AS DOUBLE)
            / (max(ta.n) * max(tb.n)), 6) AS ks_stat
    FROM cum a
    JOIN cum b ON a.v = b.v AND a.source < b.source
    JOIN tot ta ON ta.source = a.source
    JOIN tot tb ON tb.source = b.source
    GROUP BY a.source, b.source
    """,
)
def q_ks_two_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between every pair
    of sources' document-length distributions — the distribution-drift
    matrix behind "does source X look like source Y" (and, re-run per
    snapshot, "did source X drift"). The statistic is EXACT and
    integer-certified: D = max_v |cdf_a(v) − cdf_b(v)| is computed as
    an integer max of |cum_a·n_b − cum_b·n_a| before the single final
    division, so cross-engine float drift is impossible.

    Scale shape: one (source, n_chars) corpus aggregate (the only
    full-data exchange). The ECDF grid is |sources| × |distinct
    lengths| — bounded by the length domain, not the corpus — and the
    pair join multiplies that by |sources|²/2 pairs of that same
    bounded grid. All post-aggregate frames are dimension-table
    sized at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    pc = docs.groupBy(
        F.col("source"), F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = pc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    grid = pc.select("v").distinct()
    sources = pc.select("source").distinct()
    dense = sources.crossJoin(grid).join(pc, ["source", "v"], "left")
    cum = dense.select(
        "source",
        "v",
        F.sum(F.coalesce(F.col("c"), F.lit(0)))
        .over(Window.partitionBy("source").orderBy("v"))
        .cast("long")
        .alias("cc"),
    )
    a = cum.select(
        F.col("source").alias("source_a"), "v", F.col("cc").alias("cc_a")
    )
    b = cum.select(
        F.col("source").alias("source_b"), "v", F.col("cc").alias("cc_b")
    )
    pairs = a.join(b, "v").filter(F.col("source_a") < F.col("source_b"))
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    j = pairs.join(F.broadcast(ta), "source_a").join(
        F.broadcast(tb), "source_b"
    )
    diff = F.abs(
        F.col("cc_a") * F.col("n_b") - F.col("cc_b") * F.col("n_a")
    )
    return j.groupBy("source_a", "source_b").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.max(diff).cast("long").alias("ks_num"),
        F.round(
            F.max(diff).cast("double") / (F.max("n_a") * F.max("n_b")), 6
        ).alias("ks_stat"),
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    freq AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(count(*)) OVER () AS BIGINT) AS total
      FROM d GROUP BY digit
    )
    SELECT digit, n,
      round(CAST(n AS DOUBLE) / total, 6) AS obs_freq,
      round(log10(1 + 1.0 / digit), 6) AS benford_freq,
      round(abs(CAST(n AS DOUBLE) / total - log10(1 + 1.0 / digit)), 6)
        AS abs_dev
    FROM freq
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: observed first-significant-
    digit frequencies vs the log10(1+1/d) expectation — the classic
    fabricated-data / unit-mixing detector for financial columns. The
    first digit is taken lexically from the integer part (substr of the
    floored value) rather than via floor(x/10^floor(log10 x)), which is
    ulp-fragile exactly at powers of ten.

    Scale shape: one map-side-combinable digit aggregate over the scan
    (9 groups); the window total and Benford constants run on ≤ 9 rows.
    No joins, no second scan — the cheapest possible full-table
    screen."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    freq = (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "total",
            F.sum("n").over(Window.partitionBy(F.lit(1))).cast("long"),
        )
    )
    obs = F.col("n").cast("double") / F.col("total")
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return freq.select(
        "digit",
        "n",
        F.round(obs, 6).alias("obs_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(F.abs(obs - benford), 6).alias("abs_dev"),
    )


@register(
    "rfm_segments",
    """
    WITH per AS (
      SELECT o_custkey,
        CAST(max(o_orderdate) AS DATE) AS last_order,
        CAST(count(*) AS BIGINT) AS frequency,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(38,6)) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    rec AS (
      SELECT *, CAST(date_diff('day', last_order,
               max(last_order) OVER ()) AS BIGINT) AS recency_days
      FROM per
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
        CAST(6 - ntile(5) OVER (ORDER BY recency_days, o_custkey)
             AS BIGINT) AS r_score,
        CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
             AS BIGINT) AS f_score,
        CAST(ntile(5) OVER (ORDER BY monetary, o_custkey)
             AS BIGINT) AS m_score
      FROM rec
    )
    SELECT r_score, f_score, m_score,
      CAST(count(*) AS BIGINT) AS n_customers,
      round(avg(recency_days), 6) AS avg_recency_days,
      round(avg(frequency), 6) AS avg_frequency,
      round(avg(monetary), 6) AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-standard customer grid: per
    customer, Recency (days since last order, vs the table's max
    date), Frequency (order count), Monetary (decimal-exact revenue),
    each scored into quintiles (5 = best: most recent / most frequent /
    highest spend), then rolled up to segment cells with averages.
    Quintile assignment is ntile over a TOTAL order (value, custkey),
    so bucket edges are deterministic across engines and partitionings;
    monetary is a DECIMAL(18,2) partial sum rendered once to double.

    Scale shape: one per-customer aggregate over orders (the only
    corpus exchange). The three quintile assignments use the engine's
    TWO-PASS global_ntile (operators/ranking.py — range partition +
    local row_number + broadcast offsets), never a no-partition ntile
    window: the |customers| table is range-partition-sorted, not
    single-tasked. The table max is a 1-row broadcast, and the final
    rollup sees ≤ 125 cells."""
    from ..operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").cast("date").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("monetary"),
    )
    gmax = per.agg(F.max("last_order").alias("gmax"))
    rec = per.crossJoin(F.broadcast(gmax)).withColumn(
        "recency_days",
        F.datediff(F.col("gmax"), F.col("last_order")).cast("long"),
    )
    r = global_ntile(rec, ["recency_days", "o_custkey"], 5, "r_t")
    r = global_ntile(r, ["frequency", "o_custkey"], 5, "f_t")
    r = global_ntile(r, ["monetary", "o_custkey"], 5, "m_t")
    scored = r.select(
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(6) - F.col("r_t")).cast("long").alias("r_score"),
        F.col("f_t").cast("long").alias("f_score"),
        F.col("m_t").cast("long").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.avg("recency_days"), 6).alias("avg_recency_days"),
        F.round(F.avg("frequency"), 6).alias("avg_frequency"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


@register(
    "mom_revenue_growth",
    """
    WITH m AS (
      SELECT r_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(38,6)) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, month, revenue,
      lag(revenue) OVER (PARTITION BY r_name ORDER BY month)
        AS prev_revenue,
      round((revenue - lag(revenue) OVER (PARTITION BY r_name
                                          ORDER BY month))
            / lag(revenue) OVER (PARTITION BY r_name ORDER BY month),
            6) AS mom_growth
    FROM m
    """,
)
def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per region — the first page of
    any revenue dashboard: monthly decimal-exact revenue through the
    region snowflake, each month's growth rate vs the previous month
    (NULL for a region's first month, by definition). Revenue is a
    DECIMAL partial sum rendered once to double, so the growth division
    is bit-deterministic.

    Scale shape: orders joins three broadcast dims (region/nation tiny;
    customer broadcastable here, bucketed co-location at 100 TB), then
    ONE (region, month) hash aggregate with map-side partials — the
    only exchange. The lag window runs on |regions|·|months| rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("c_custkey", "r_name")
    )
    m = (
        orders.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "r_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("r_name").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "r_name",
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@register(
    "kaplan_meier_retention",
    """
    WITH first_ev AS (
      SELECT user_id, event_type AS cohort
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) = 1
    ),
    per AS (
      SELECT e.user_id, f.cohort,
             CAST(min(e.ts) AS DATE) AS d0, CAST(max(e.ts) AS DATE) AS d1,
             max(e.ts) AS t1
      FROM events e JOIN first_ev f ON f.user_id = e.user_id
      GROUP BY e.user_id, f.cohort
    ),
    lab AS (
      SELECT cohort, CAST(date_diff('day', d0, d1) AS BIGINT) AS dur,
        CASE WHEN t1 < max(t1) OVER () - INTERVAL 7 DAY THEN 1 ELSE 0 END
          AS died
      FROM per
    ),
    tab AS (
      SELECT cohort, dur, CAST(sum(died) AS BIGINT) AS deaths,
             CAST(count(*) AS BIGINT) AS ending
      FROM lab GROUP BY cohort, dur
    ),
    risk AS (
      SELECT cohort, dur, deaths,
        CAST(sum(ending) OVER (PARTITION BY cohort ORDER BY dur DESC)
             AS BIGINT) AS n_at_risk
      FROM tab
    )
    SELECT cohort, dur, n_at_risk, deaths,
      round(exp(sum(
        CASE WHEN deaths = 0 THEN 0.0
             WHEN deaths < n_at_risk
               THEN ln(1 - CAST(deaths AS DOUBLE) / n_at_risk)
             ELSE -1000.0 END
      ) OVER (PARTITION BY cohort ORDER BY dur)), 6) AS survival
    FROM risk
    """,
)
def q_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier retention curves, stratified by acquisition cohort
    (the user's FIRST event type): per user, lifetime = days between
    first and last event; a user whose last event precedes the table's
    horizon by >7 quiet days "churned" (death) at that lifetime,
    otherwise they are right-CENSORED — the estimator the naive
    "% still active after N days" gets wrong by ignoring censoring.
    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over realized lifetime days per
    cohort, computed as exp of a running sum of log terms; d_i/n_i
    divisions of integers are IEEE-exact, so the only cross-engine
    slack is libm ln/exp ulps, absorbed by round 6. A day where
    everyone remaining dies short-circuits to exp(−1000) = exact 0.0.

    Scale shape: the first-event pick and the per-user min/max share
    ONE user-keyed exchange (window + aggregate back-to-back); the
    lifetime table is |cohorts|·|days-range| rows after the second
    aggregate, and both the reverse-cumulative risk window and the
    forward survival window run on that tiny table in one sort."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_ev = (
        ev.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("cohort"))
    )
    per = (
        ev.join(first_ev, "user_id")
        .groupBy("user_id", "cohort")
        .agg(
            F.min("ts").cast("date").alias("d0"),
            F.max("ts").cast("date").alias("d1"),
            F.max("ts").alias("t1"),
        )
    )
    lab = per.select(
        "cohort",
        F.datediff("d1", "d0").cast("long").alias("dur"),
        F.when(
            F.col("t1")
            < F.max("t1").over(Window.partitionBy(F.lit(1)))
            - F.expr("INTERVAL 7 DAYS"),
            1,
        )
        .otherwise(0)
        .alias("died"),
    )
    tab = lab.groupBy("cohort", "dur").agg(
        F.sum("died").cast("long").alias("deaths"),
        F.count(F.lit(1)).cast("long").alias("ending"),
    )
    risk = tab.select(
        "cohort",
        "dur",
        "deaths",
        F.sum("ending")
        .over(Window.partitionBy("cohort").orderBy(F.desc("dur")))
        .cast("long")
        .alias("n_at_risk"),
    )
    term = (
        F.when(F.col("deaths") == 0, F.lit(0.0))
        .when(
            F.col("deaths") < F.col("n_at_risk"),
            F.log(
                1 - F.col("deaths").cast("double") / F.col("n_at_risk")
            ),
        )
        .otherwise(F.lit(-1000.0))
    )
    return risk.select(
        "cohort",
        "dur",
        "n_at_risk",
        "deaths",
        F.round(
            F.exp(
                F.sum(term).over(
                    Window.partitionBy("cohort").orderBy("dur")
                )
            ),
            6,
        ).alias("survival"),
    )


@register(
    "markov_stationary_events",
    """
    WITH RECURSIVE seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS num
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    dn AS (SELECT cur, CAST(sum(num) AS BIGINT) AS den
           FROM trans GROUP BY cur),
    pe AS (
      SELECT t.cur, t.nxt,
             CAST((t.num * 1000000) // d.den AS BIGINT) AS pf
      FROM trans t JOIN dn d ON d.cur = t.cur
    ),
    states AS (SELECT DISTINCT event_type FROM events),
    it(i, s, p) AS (
      SELECT 0, event_type,
        CAST(1000000000000 // (SELECT count(*) FROM states) AS BIGINT)
      FROM states
      UNION ALL
      SELECT d.i + 1, t.nxt,
             CAST(sum((d.p * t.pf) // 1000000) AS BIGINT)
      FROM it d JOIN pe t ON t.cur = d.s
      WHERE d.i < 30
      GROUP BY d.i + 1, t.nxt
    )
    SELECT s AS event_type, p AS p_fp,
      round(CAST(p AS DOUBLE) / sum(p) OVER (), 6) AS stationary_prob
    FROM it WHERE i = 30
    """,
)
def q_markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (the long-run fraction of traffic each event type attracts if
    users keep behaving like today) — the summary number the raw
    event_transition_matrix can't give. 30 power-iteration steps in
    FIXED-POINT INTEGER arithmetic: edge probabilities are
    (count·10^6) div row-total, each step's mass is Σ (p·pf) div 10^6 —
    integer multiply/divide/sum only, so every step is bit-identical
    across engines and partitionings (float matrix powers are
    un-oracle-able: per-state sums depend on partition order). The
    oracle runs the IDENTICAL recurrence as a recursive CTE (an
    unrolled 30-CTE chain was tried first and planned EXPONENTIALLY in
    DuckDB — each step re-inlines the edge subtree — >120 s vs ~50 ms
    recursive).
    Truncation leaks <1e-6 of mass per step, absorbed by the final
    normalization. Overflow bound: p ≤ 10^12 and pf ≤ 10^6, so each
    product ≤ 10^18 < 2^63 regardless of corpus size.

    Scale shape: one user-keyed window + one (cur,nxt) aggregate build
    the ≤|types|² edge table — the only corpus exchanges. The 30
    iteration rounds run on |types|-row frames (localCheckpoint-ed per
    round, pagerank's bounded-plan-depth discipline), costing 30 tiny
    driver-scheduled jobs and zero corpus traffic."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(wu).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("num")
    )
    dn = trans.groupBy("cur").agg(F.sum("num").cast("long").alias("den"))
    pe = (
        trans.join(dn, "cur")
        .select(
            "cur",
            "nxt",
            F.expr("CAST((num * 1000000L) div den AS BIGINT)").alias("pf"),
        )
        .localCheckpoint()
    )
    states = ev.select("event_type").distinct()
    n_states = states.count()
    dist = states.select(
        F.col("event_type").alias("s"),
        F.lit(1_000_000_000_000 // n_states).cast("long").alias("p"),
    ).localCheckpoint()
    last_ck = dist
    for i in range(30):
        dist = (
            dist.join(pe, dist["s"] == pe["cur"])
            .select(
                F.col("nxt").alias("s2"),
                F.expr("CAST((p * pf) div 1000000L AS BIGINT)").alias(
                    "term"
                ),
            )
            .groupBy("s2")
            .agg(F.sum("term").cast("long").alias("p"))
            .withColumnRenamed("s2", "s")
        )
        # checkpoint every 6 rounds: plan depth stays ≤ 6 tiny
        # join+agg levels while eager materialization drops from 30
        # jobs to 5 (each round is a |types|-row frame — the job
        # scheduling, not the data, is the cost)
        if (i + 1) % 6 == 0:
            prev_ck, last_ck = last_ck, dist.localCheckpoint()
            dist = last_ck
            try:  # free the superseded checkpoint (CC discipline)
                prev_ck._jdf.queryExecution().analyzed().rdd().unpersist(
                    False
                )
            except Exception:
                pass
    total = Window.partitionBy(F.lit(1))
    return dist.select(
        F.col("s").alias("event_type"),
        F.col("p").alias("p_fp"),
        F.round(
            F.col("p").cast("double") / F.sum("p").over(total), 6
        ).alias("stationary_prob"),
    )


@register(
    "readability_forcast",
    """
    WITH words AS (
      SELECT d.source, w AS word
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(w)
      WHERE w <> ''
    ),
    scored AS (
      SELECT source, length(word) AS wlen,
        len(regexp_extract_all(word, '[aeiou]+')) AS syl
      FROM words
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_words,
      round(avg(CAST(wlen AS DOUBLE)), 6) AS avg_word_len,
      round(avg(CAST(syl AS DOUBLE)), 6) AS avg_syllables,
      round(CAST(sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS mono_frac,
      round(20 - 15 * CAST(sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 6) AS forcast_grade
    FROM scored GROUP BY source
    """,
)
def q_readability_forcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORCAST readability per source — the one classic readability
    formula that needs NO sentence boundaries (built for technical/
    fragmentary text, which is exactly what scraped training corpora
    look like after boilerplate stripping): grade = 20 − N/10 where N
    is monosyllabic words per 150, i.e. 20 − 15·mono_frac. Syllables
    are the standard vowel-group proxy (maximal [aeiou]+ runs per
    word). All inputs are integer counts; the four output ratios are
    single rounded divisions of exact integers, so cross-engine float
    drift is impossible.

    Scale shape: one token explode over the scan (the same cost class
    as every tokenizing query here — no join, no second pass) feeding
    a per-source partial aggregate; syllable counting is a per-token
    JVM regexp, no Python boundary. The rollup output is |sources|
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    scored = words.select(
        "source",
        F.length("word").alias("wlen"),
        F.size(
            F.regexp_extract_all("word", F.lit("([aeiou]+)"), 1)
        ).alias("syl"),
    )
    mono = F.sum(F.when(F.col("syl") == 1, 1).otherwise(0)).cast("double")
    cnt = F.count(F.lit(1))
    return scored.groupBy("source").agg(
        cnt.cast("long").alias("n_words"),
        F.round(F.avg(F.col("wlen").cast("double")), 6).alias(
            "avg_word_len"
        ),
        F.round(F.avg(F.col("syl").cast("double")), 6).alias(
            "avg_syllables"
        ),
        F.round(mono / cnt, 6).alias("mono_frac"),
        F.round(20 - 15 * mono / cnt, 6).alias("forcast_grade"),
    )


@register(
    "zipf_slope_by_source",
    """
    WITH tf AS (
      SELECT d.source, w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(w)
      WHERE w <> ''
      GROUP BY d.source, w
    ),
    ranked AS (
      SELECT source,
        ln(CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY freq DESC, word) AS DOUBLE))
          AS x,
        ln(CAST(freq AS DOUBLE)) AS y
      FROM tf
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_types,
      round((count(*) * sum(x * y) - sum(x) * sum(y))
            / (count(*) * sum(x * x) - sum(x) * sum(x)), 6)
        AS zipf_slope,
      round((sum(y) - ((count(*) * sum(x * y) - sum(x) * sum(y))
                       / (count(*) * sum(x * x) - sum(x) * sum(x)))
                      * sum(x)) / count(*), 6) AS zipf_intercept
    FROM ranked GROUP BY source
    """,
)
def q_zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(freq) on ln(rank)
    over the source's term-frequency table — natural text sits near
    slope −1; template/spam/generated text bends away, making the
    slope a cheap corpus-health fingerprint (and its drift a
    contamination alarm). The slope is computed from the closed-form
    normal equations with explicit Σx, Σy, Σxy, Σx² (NOT the engines'
    regr_slope, whose internal accumulation orders differ); the double
    sums commute up to 1e-12 relative noise, absorbed by round 6;
    ranks are total-ordered (freq desc, word) so x is identical on
    both engines.

    Scale shape: one token explode into a (source, word) hash
    aggregate — the corpus exchange — then a source-keyed rank window
    and a |sources|-row rollup over the term table (|vocab| rows,
    bounded by vocabulary, not corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wr = Window.partitionBy("source").orderBy(F.desc("freq"), "word")
    ranked = tf.select(
        "source",
        F.log(F.row_number().over(wr).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return ranked.groupBy("source").agg(
        n.cast("long").alias("n_types"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


@register(
    "cube_event_profile",
    """
    SELECT event_type, dayofweek(ts) + 1 AS dow,
      CAST(grouping(event_type) * 2 + grouping(dayofweek(ts) + 1)
           AS BIGINT) AS gid,
      CAST(count(*) AS BIGINT) AS n,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6))
           AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, dayofweek(ts) + 1)
    """,
)
def q_cube_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (event_type, day-of-week): all four
    aggregation granularities — cell, per-type, per-day, grand total —
    in ONE pass, with grouping() bits disambiguating a rolled-up NULL
    from a data NULL (the correctness trap naive cube consumers hit).
    Complements the existing ROLLUP query (rollup_region_nation) with
    the full-lattice operator. Value totals are DECIMAL partial sums
    rendered once to double.

    Scale shape: Spark plans CUBE as a single Expand (4× row
    multiplication) feeding one hash aggregate with map-side partials
    — one exchange carrying partial aggregates, NOT four scans. Output
    is ≤ (|types|+1)·8 rows."""
    # Spark dayofweek: Sunday=1..7; DuckDB dayofweek: Sunday=0..6, so
    # the oracle shifts by +1 (the chi_square_independence convention)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dow", F.dayofweek("ts")
    )
    return ev.cube("event_type", "dow").agg(
        (F.grouping("event_type") * 2 + F.grouping("dow"))
        .cast("long")
        .alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("total_value"),
    )


@register(
    "seasonality_autocorr",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT a.event_type, l.lag_hours, a.n AS x, f.n AS y
      FROM (VALUES (24), (168)) AS l(lag_hours)
      JOIN hourly a ON TRUE
      JOIN hourly f
        ON f.event_type = a.event_type
       AND f.h = a.h - to_hours(CAST(l.lag_hours AS BIGINT))
    )
    SELECT event_type, CAST(lag_hours AS BIGINT) AS lag_hours,
      CAST(count(*) AS BIGINT) AS n_pairs,
      round(
        CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        / sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
               * CAST(count(*) * sum(y * y) - sum(y) * sum(y)
                      AS DOUBLE)),
        6) AS autocorr
    FROM lagged GROUP BY event_type, lag_hours
    """,
)
def q_seasonality_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength diagnostic: Pearson autocorrelation of the
    hourly volume series at daily (24 h) and weekly (168 h) lags, per
    event type — the number that says whether seasonal_naive_backtest's
    model is even applicable (r≈0 ⇒ no rhythm to exploit). All five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINT
    sums of integer hourly counts — the correlation is two exact
    integers divided once at the end, so cross-engine float drift is
    impossible. (At volumes where an hourly count squared would
    overflow BIGINT — ~3e9/hour — swap the sums to DECIMAL(38,0);
    the testdata and any realistic per-type hourly series are orders
    of magnitude below.)

    Scale shape: one (type, hour) corpus aggregate with map-side
    partials; the lag self-joins and the final rollup run on the
    |types|·|hours| hourly table, never the raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lags = spark.createDataFrame([(24,), (168,)], ["lag_hours"]).select(
        F.col("lag_hours").cast("long").alias("lag_hours")
    )
    shifted = hourly.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag_hours",
        (
            F.col("h")
            + F.col("lag_hours")
            * F.expr("INTERVAL 1 HOUR")
        ).alias("h"),
        F.col("n").alias("y"),
    )
    lagged = hourly.withColumnRenamed("n", "x").join(
        shifted, ["event_type", "h"]
    )
    k = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    return lagged.groupBy("event_type", "lag_hours").agg(
        k.cast("long").alias("n_pairs"),
        F.round(
            (k * sxy - sx * sy).cast("double")
            / F.sqrt(
                (k * sxx - sx * sx).cast("double")
                * (k * syy - sy * sy).cast("double")
            ),
            6,
        ).alias("autocorr"),
    )


@register(
    "anova_value_by_type",
    """
    WITH g AS (
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sx,
        CAST(sum(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6))
          AS sxx
      FROM events GROUP BY event_type
    ),
    parts AS (
      SELECT ng,
        CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / ng AS sq_over_n
      FROM g
    )
    SELECT
      CAST(sum(ng) AS BIGINT) AS n,
      CAST(count(*) AS BIGINT) AS k,
      round(sum(sq_over_n) - sum(sx) * sum(sx) / sum(ng), 6) AS ssb,
      round(sum(sxx) - sum(sq_over_n), 6) AS ssw,
      CAST(count(*) - 1 AS BIGINT) AS df1,
      CAST(sum(ng) - count(*) AS BIGINT) AS df2,
      round(((sum(sq_over_n) - sum(sx) * sum(sx) / sum(ng))
             / (count(*) - 1))
            / ((sum(sxx) - sum(sq_over_n)) / (sum(ng) - count(*))),
            6) AS f_stat,
      round((sum(sq_over_n) - sum(sx) * sum(sx) / sum(ng))
            / (sum(sxx) - sum(sx) * sum(sx) / sum(ng)), 6)
        AS eta_squared
    FROM parts
    """,
)
def q_anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event `value` across event types — the
    continuous-outcome counterpart to chi_square_independence: F-stat
    (between/within variance ratio) plus eta² effect size, the screen
    for "does this metric actually differ by segment". Per-group Σx
    and Σx² are DECIMAL(18,2)-exact partial sums (the engine's value
    convention), so the corpus-side arithmetic is order-independent;
    the SSB/SSW assembly runs in double on the ≤|types|-row group
    table where every operand is already exact.

    Scale shape: ONE hash aggregate over the scan (map-side partials)
    producing |types| rows; everything after is driver-trivial. The
    cheapest possible k-group hypothesis test at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(vd).cast("decimal(38,6)").alias("sx_d"),
        F.sum(vd * vd).cast("decimal(38,6)").alias("sxx_d"),
    )
    parts = g.select(
        "ng",
        F.col("sx_d").cast("double").alias("sx"),
        F.col("sxx_d").cast("double").alias("sxx"),
        (
            F.col("sx_d").cast("double")
            * F.col("sx_d").cast("double")
            / F.col("ng")
        ).alias("sq_over_n"),
    )
    n, kk = F.sum("ng"), F.count(F.lit(1))
    ssb = F.sum("sq_over_n") - F.sum("sx") * F.sum("sx") / n
    ssw = F.sum("sxx") - F.sum("sq_over_n")
    sst = F.sum("sxx") - F.sum("sx") * F.sum("sx") / n
    return parts.agg(
        n.cast("long").alias("n"),
        kk.cast("long").alias("k"),
        F.round(ssb, 6).alias("ssb"),
        F.round(ssw, 6).alias("ssw"),
        (kk - 1).cast("long").alias("df1"),
        (n - kk).cast("long").alias("df2"),
        F.round((ssb / (kk - 1)) / (ssw / (n - kk)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


@register(
    "unpivot_event_matrix",
    """
    WITH wide AS (
      SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click')    AS click,
        count(*) FILTER (WHERE event_type = 'error')    AS error,
        count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        count(*) FILTER (WHERE event_type = 'view')     AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n
    FROM wide
    UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
    WHERE n > 0
    """,
)
def q_unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) operator coverage: the per-user event-count
    matrix pivoted WIDE and unpivoted back to long in one plan — the
    wide→long reshaping every feature-matrix pipeline needs (the
    existing pivot query covers long→wide; this closes the loop).
    Zero-count cells are dropped (n > 0) so the round trip reproduces
    exactly the realized (user, type) pairs.

    Scale shape: the pivot is one user-keyed hash aggregate with an
    explicit value list (no distinct-values pre-job); Spark's unpivot
    is a narrow Expand on the aggregated |users|×5 table — no second
    exchange, no join."""
    from .queries import _EVENT_TYPES

    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .select(
            "user_id",
            *[
                F.coalesce(F.col(t), F.lit(0)).alias(t)
                for t in _EVENT_TYPES
            ],
        )
    )
    return (
        wide.unpivot("user_id", _EVENT_TYPES, "event_type", "n")
        .filter(F.col("n") > 0)
        .select("user_id", "event_type", F.col("n").cast("long").alias("n"))
    )


@register(
    "loo_target_encoding",
    """
    WITH enc AS (
      SELECT event_id, event_type,
        CAST(sum(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY event_type)
             - CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,6)) AS loo_sum,
        count(*) OVER (PARTITION BY event_type) - 1 AS loo_n
      FROM events
    )
    SELECT event_id, event_type,
      round(CAST(loo_sum AS DOUBLE) / loo_n, 6) AS loo_encoding
    FROM enc
    QUALIFY row_number() OVER (ORDER BY event_id) <= 100
    """,
)
def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type against `value` —
    the standard high-cardinality-categorical feature for tabular
    models, in its leakage-safe form: each row's encoding is the mean
    target of its category EXCLUDING the row itself (plain category
    means leak the row's own label into its feature; LOO is the
    one-pass fix). The per-category sum is a DECIMAL(18,2) partial
    aggregate, the row's own value is subtracted in decimal, and the
    single double division happens last — bit-deterministic. First 100
    event_ids returned as the certified sample.

    Scale shape: one category-keyed window (sum + count share the
    partition spec → one exchange) over the corpus; no join, no
    second pass. The sample cut is orderBy(event_id).limit(100) —
    TakeOrderedAndProject, never a no-partition row_number window; the
    encoding itself streams out row-parallel."""
    ev = load_table(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,2)")
    wt = Window.partitionBy("event_type")
    enc = ev.select(
        "event_id",
        "event_type",
        (F.sum(vd).over(wt) - vd).cast("decimal(38,6)").alias("loo_sum"),
        (F.count(F.lit(1)).over(wt) - 1).alias("loo_n"),
    )
    return (
        enc.orderBy("event_id")
        .limit(100)
        .select(
            "event_id",
            "event_type",
            F.round(
                F.col("loo_sum").cast("double") / F.col("loo_n"), 6
            ).alias("loo_encoding"),
        )
    )


@register(
    "embedding_centroid_shift",
    """
    WITH q AS (
      SELECT e.label, t.pos,
        CAST(round(e.embedding[t.pos] * 1000) AS BIGINT) AS qx
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS t(pos)
    ),
    per AS (
      SELECT label, pos, CAST(sum(qx) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY label, pos
    ),
    gcent AS (
      SELECT pos, CAST(sum(sq) AS BIGINT) AS gq,
             CAST(sum(n) AS BIGINT) AS gn
      FROM per GROUP BY pos
    )
    SELECT p.label, CAST(max(p.n) AS BIGINT) AS n_vectors,
      round(sqrt(sum(
        (CAST(p.sq AS DOUBLE) / p.n - CAST(g.gq AS DOUBLE) / g.gn)
        * (CAST(p.sq AS DOUBLE) / p.n - CAST(g.gq AS DOUBLE) / g.gn)
      )) / 1000, 6) AS centroid_shift
    FROM per p JOIN gcent g ON g.pos = p.pos
    GROUP BY p.label
    """,
)
def q_embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift: the L2 distance between each
    label's centroid and the global centroid — the first diagnostic for
    "is this class linearly separable at all / did the embedding space
    move between snapshots". Float sums are partition-order-dependent,
    so vectors are QUANTIZED to integer thousandths first (float32 →
    double widening and round() are IEEE-exact and identical on both
    engines); all corpus-side sums are then exact BIGINT, and the only
    float math is |dims| exact-integer divisions and one sqrt on the
    |labels|×|dims| table, absorbed by round 6.

    Scale shape: one posexplode over the scan into a (label, pos) hash
    aggregate — corpus exchange #1 and the only one; the global
    centroid derives from the per-label sums (dimension-table sized),
    and the final join+rollup is |labels|·|dims| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        # DuckDB's 1-based ordinality
        (F.col("pos") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000)
        .cast("long")
        .alias("qx"),
    )
    per = q.groupBy("label", "pos").agg(
        F.sum("qx").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    glob = per.groupBy("pos").agg(
        F.sum("sq").cast("long").alias("gq"),
        F.sum("n").cast("long").alias("gn"),
    )
    d = (
        F.col("sq").cast("double") / F.col("n")
        - F.col("gq").cast("double") / F.col("gn")
    )
    return (
        per.join(F.broadcast(glob), "pos")
        .groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.round(F.sqrt(F.sum(d * d)) / 1000, 6).alias(
                "centroid_shift"
            ),
        )
    )


@register(
    "pca_top_component",
    """
    WITH RECURSIVE q AS (
      SELECT e.vec_id, t.pos,
        CAST(round(e.embedding[t.pos] * 1000) AS BIGINT) AS qx
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS t(pos)
    ),
    c AS (
      SELECT a.pos AS i, b.pos AS j,
             CAST(sum(a.qx * b.qx) AS BIGINT) AS s
      FROM q a JOIN q b ON a.vec_id = b.vec_id
      GROUP BY a.pos, b.pos
    ),
    cw AS (SELECT i, j, s // 1000 AS w FROM c),
    it(k, j, v) AS (
      SELECT 0, i, CAST(1000000 AS BIGINT)
      FROM (SELECT DISTINCT i FROM cw)
      UNION ALL
      SELECT k, j, (v * 1000000) // mx FROM (
        SELECT d.k + 1 AS k, t.j AS j,
               CAST(sum(t.w * d.v) AS BIGINT) AS v,
               max(abs(CAST(sum(t.w * d.v) AS BIGINT))) OVER () AS mx
        FROM it d JOIN cw t ON t.i = d.j
        WHERE d.k < 80
        GROUP BY d.k + 1, t.j
      )
    ),
    vf AS (SELECT j, v FROM it WHERE k = 80),
    ray AS (
      SELECT round(
        CAST((SELECT sum(CAST(va.v AS DECIMAL(38,0)) * c.s * vb.v)
              FROM c JOIN vf va ON va.j = c.i
                     JOIN vf vb ON vb.j = c.j) AS DOUBLE)
        / CAST((SELECT sum(v * v) FROM vf) AS DOUBLE), 6) AS rayleigh
    )
    SELECT vf.j AS pos, vf.v AS v_fp,
      round(CAST(vf.v AS DOUBLE) / 1000000, 6) AS loading,
      ray.rayleigh
    FROM vf, ray
    """,
)
def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (uncentered
    PCA / leading Gram-matrix eigenvector) by 80 rounds of power
    iteration in FIXED-POINT INTEGER arithmetic — the "what axis
    dominates this embedding space" diagnostic, distributed. Vectors
    quantize to integer thousandths; the dim×dim Gram matrix is an
    exact BIGINT aggregate; each round is v′ = (C÷1000)·v followed by
    integer max-abs renormalization to ±10^6 — multiply, floor-divide,
    sum, max only, so all 80 rounds are bit-identical (the synthetic
    embedding spectrum is nearly flat - eigengap ratio 0.93 - so the
    0.93^k convergence needs ~80 rounds for 3-nines alignment; a real
    corpus with a dominant direction converges in a handful) across engines
    and partitionings (float power iteration is un-oracle-able). The
    Rayleigh quotient vᵀCv/vᵀv (in DECIMAL(38,0) exact products)
    reports the matching eigenvalue at the original ×10^6 scale.
    Overflow budget: |C÷1000| ≤ 1.6e8 · |v| ≤ 1e6 · dim 64 ⇒ Σ ≤ 1e16.

    Scale shape: the Gram build is the corpus stage — posexplode then
    a self-equi-join on vec_id producing |vecs|·dim² product terms
    into a (i,j) hash aggregate with map-side partials (at very large
    dim, swap to a per-partition BLAS mapInPandas emitting partial
    Grams; the recurrence downstream is unchanged). Iteration runs on
    the checkpointed 64×64 table: 80 joins on 4096 rows, zero corpus
    traffic."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000).cast("long").alias("qx"),
    )
    c = (
        q.alias("a")
        .join(q.alias("b"), "vec_id")
        .groupBy(
            F.col("a.pos").alias("i"), F.col("b.pos").alias("j")
        )
        .agg(F.sum(F.col("a.qx") * F.col("b.qx")).cast("long").alias("s"))
        .localCheckpoint()
    )
    cw = c.select("i", "j", F.expr("s div 1000").alias("w")).localCheckpoint()
    v = (
        cw.select(F.col("i").alias("j"))
        .distinct()
        .select("j", F.lit(1_000_000).cast("long").alias("v"))
        .localCheckpoint()
    )
    for k in range(80):
        nxt = (
            cw.join(v.withColumnRenamed("j", "i"), "i")
            .groupBy("j")
            .agg(F.sum(F.col("w") * F.col("v")).cast("long").alias("vn"))
            .withColumn(
                "mx",
                F.max(F.abs(F.col("vn"))).over(
                    Window.partitionBy(F.lit(1))
                ),
            )
            .select(
                "j", F.expr("(vn * 1000000L) div mx").alias("v")
            )
        )
        # bounded plan depth: checkpoint every 10 rounds (markov
        # discipline — the frame is 64 rows; scheduling is the cost)
        v = nxt.localCheckpoint() if (k + 1) % 10 == 0 else nxt
    num = (
        c.join(v.select(F.col("j").alias("i"), F.col("v").alias("va")), "i")
        .join(v.select(F.col("j"), F.col("v").alias("vb")), "j")
        .agg(
            F.sum(
                F.col("va").cast("decimal(38,0)")
                * F.col("s")
                * F.col("vb")
            ).alias("num")
        )
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).cast("long").alias("den"))
    ray = num.crossJoin(F.broadcast(den)).select(
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("rayleigh")
    )
    return v.crossJoin(F.broadcast(ray)).select(
        F.col("j").alias("pos"),
        F.col("v").alias("v_fp"),
        F.round(F.col("v").cast("double") / 1_000_000, 6).alias("loading"),
        "rayleigh",
    )


@register(
    "last_touch_attribution",
    """
    WITH marked AS (
      SELECT event_type, value, ts, user_id, event_id,
        CASE WHEN event_type <> 'purchase' THEN event_type END
          AS touch_type,
        CASE WHEN event_type <> 'purchase' THEN ts END AS touch_ts
      FROM events
    ),
    attrib AS (
      SELECT event_type, value, ts,
        last_value(touch_type IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS channel,
        last_value(touch_ts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS channel_ts
      FROM marked
    )
    SELECT coalesce(channel, 'direct') AS channel,
      CAST(count(*) AS BIGINT) AS n_purchases,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6))
           AS DOUBLE) AS attributed_revenue
    FROM attrib
    WHERE event_type = 'purchase'
      AND (channel_ts IS NULL
           OR ts - channel_ts <= INTERVAL 1 HOUR)
    GROUP BY 1
    """,
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits its
    value to the user's most recent NON-purchase event within the
    preceding hour (the marketing-standard attribution window);
    purchases with no qualifying touch are 'direct'. The lookup is a
    running last_value IGNORE NULLS over a 1-row-lagged frame — the
    same single-exchange idiom as sensor_gap_interpolation, NOT a
    range self-join. Revenue is a DECIMAL partial sum rendered once.

    Scale shape: ONE user-keyed exchange feeds both windows (shared
    partition+order spec); the attribution rollup is ≤|types|+1
    groups. At 100 TB this is sessionization cost — the naive
    per-purchase "latest event before t" join would be a range join
    per purchase instead."""
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "event_type",
        "value",
        "ts",
        "user_id",
        "event_id",
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("touch_type"),
        F.when(F.col("event_type") != "purchase", F.col("ts")).alias(
            "touch_ts"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attrib = marked.select(
        "event_type",
        "value",
        "ts",
        F.last("touch_type", ignorenulls=True).over(w).alias("channel"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("channel_ts"),
    )
    return (
        attrib.filter(
            (F.col("event_type") == "purchase")
            & (
                F.col("channel_ts").isNull()
                | (
                    F.col("ts") - F.col("channel_ts")
                    <= F.expr("INTERVAL 1 HOUR")
                )
            )
        )
        .groupBy(
            F.coalesce(F.col("channel"), F.lit("direct")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("attributed_revenue"),
        )
    )


@register(
    "two_proportion_ztest",
    """
    WITH conv AS (
      SELECT user_id % 2 AS arm,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS converted
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    g AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS x
      FROM conv GROUP BY arm
    )
    SELECT
      CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
      CAST(max(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x_a,
      CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
      CAST(max(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x_b,
      round(CAST(max(CASE WHEN arm = 0 THEN x END) AS DOUBLE)
            / max(CASE WHEN arm = 0 THEN n END), 6) AS p_a,
      round(CAST(max(CASE WHEN arm = 1 THEN x END) AS DOUBLE)
            / max(CASE WHEN arm = 1 THEN n END), 6) AS p_b,
      round(
        (CAST(max(CASE WHEN arm = 1 THEN x END) AS DOUBLE)
           / max(CASE WHEN arm = 1 THEN n END)
         - CAST(max(CASE WHEN arm = 0 THEN x END) AS DOUBLE)
           / max(CASE WHEN arm = 0 THEN n END))
        / sqrt(
            (CAST(sum(x) AS DOUBLE) / sum(n))
            * (1 - CAST(sum(x) AS DOUBLE) / sum(n))
            * (1.0 / max(CASE WHEN arm = 0 THEN n END)
               + 1.0 / max(CASE WHEN arm = 1 THEN n END))
          ), 6) AS z_stat
    FROM g
    """,
)
def q_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on USER-DAY conversion (a day with ≥1
    purchase) between deterministic split arms (user_id parity — the
    hash-split stand-in) — the pre-CUPED baseline readout every A/B
    platform ships: pooled standard error, z statistic. The unit is
    user-day, not user, because at this event density every user
    eventually purchases (p=1 in both arms makes the pooled SE exactly
    0 — found the hard way under ANSI mode's DIVIDE_BY_ZERO). All
    counts are exact integers; the five output doubles are single
    divisions/sqrt of exact integers at the very end — no float
    accumulation anywhere.

    Scale shape: one per-(user,day) aggregate over events (corpus
    exchange), one 2-row arm rollup, one 1-row pivot. The cheapest
    possible experiment readout; pairs with ab_test_cuped for the
    variance-reduced version."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    g = conv.select(
        (F.col("user_id") % 2).alias("arm"), "converted"
    ).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("x"),
    )
    na = F.max(F.when(F.col("arm") == 0, F.col("n")))
    xa = F.max(F.when(F.col("arm") == 0, F.col("x")))
    nb = F.max(F.when(F.col("arm") == 1, F.col("n")))
    xb = F.max(F.when(F.col("arm") == 1, F.col("x")))
    pp = F.sum("x").cast("double") / F.sum("n")
    return g.agg(
        na.cast("long").alias("n_a"),
        xa.cast("long").alias("x_a"),
        nb.cast("long").alias("n_b"),
        xb.cast("long").alias("x_b"),
        F.round(xa.cast("double") / na, 6).alias("p_a"),
        F.round(xb.cast("double") / nb, 6).alias("p_b"),
        F.round(
            (xb.cast("double") / nb - xa.cast("double") / na)
            / F.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)),
            6,
        ).alias("z_stat"),
    )


@register(
    "bigram_lm_perplexity",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t,
        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
      FROM documents
    ),
    train_bg AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS cb
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
      WHERE is_train GROUP BY 1, 2
    ),
    ctx AS (
      SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM train_bg GROUP BY w1
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT t[i]) AS BIGINT) AS v
      FROM toks, unnest(generate_series(1, len(t))) AS g(i)
      WHERE is_train
    ),
    test_bg AS (
      SELECT source, t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
      WHERE NOT is_train
    )
    SELECT s.source,
      CAST(count(*) AS BIGINT) AS n_bigrams,
      round(exp(-sum(CAST(floor(
        ln((coalesce(b.cb, 0) + 1.0) / (coalesce(c.cu, 0) + vocab.v))
        * 1000000000) AS BIGINT)) / 1e9 / count(*)), 6) AS perplexity
    FROM test_bg s
    LEFT JOIN train_bg b ON b.w1 = s.w1 AND b.w2 = s.w2
    LEFT JOIN ctx c ON c.w1 = s.w1
    CROSS JOIN vocab
    GROUP BY s.source
    """,
)
def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per source — the classic cheap
    quality/outlier score for pretraining corpora (the KenLM-filter
    pattern): train an add-one-smoothed bigram LM on a deterministic
    75% md5 doc split, score the held-out 25%, report per-source
    perplexity exp(−mean ln P(w2|w1)). OOV contexts fall back to 1/V
    automatically (both counts coalesce to 0). The doc-level split
    makes it leakage-safe; all counts are exact integers. The per-term
    ln is quantized to fixed-point BIGINT (floor(ln(p)·1e9)) BEFORE
    summing — the repo's ra_fp/_MV_FIX discipline — so the aggregate
    is an associative integer sum, stable under any partitioning or
    engine; the float exp/round runs once per source on the exact sum.
    (A 1-ulp cross-engine ln difference can flip one term's floor by
    1, shifting the exp argument by 1e-9/n — invisible at round 6.)

    Scale shape: two token explodes over the scan (train counts, test
    scoring) — the corpus stages; the model is (bigram, count) +
    (context, count) tables, joined to test bigrams as hash equi-joins
    (broadcastable while vocab² stays dim-sized; bucketed at 100 TB).
    The vocab size is a 1-row broadcast. No window, no sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("t"),
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < "c"
        ).alias("is_train"),
    )
    bg_expr = F.explode(
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
        )
    ).alias("bg")
    train_bg = (
        toks.filter("is_train")
        .filter(F.size("t") >= 2)
        .select(bg_expr)
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    ctx = train_bg.groupBy("w1").agg(F.sum("cb").cast("long").alias("cu"))
    vocab = (
        toks.filter("is_train")
        .select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    test_bg = (
        toks.filter(~F.col("is_train"))
        .filter(F.size("t") >= 2)
        .select("source", bg_expr)
        .select("source", "bg.w1", "bg.w2")
    )
    scored = (
        test_bg.join(F.broadcast(train_bg), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    term_fp = F.floor(
        F.log(
            (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
        )
        * F.lit(1000000000)
    ).cast("bigint")
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.exp(-F.sum(term_fp) / F.lit(1e9) / F.count(F.lit(1))), 6
        ).alias("perplexity"),
    )


@register(
    "transition_entropy_mi",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS num
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    dn AS (SELECT cur, CAST(sum(num) AS BIGINT) AS den
           FROM trans GROUP BY cur),
    tot AS (SELECT CAST(sum(num) AS BIGINT) AS t FROM trans),
    hnext AS (
      SELECT round(-sum(
        (CAST(col AS DOUBLE) / t) * ln(CAST(col AS DOUBLE) / t)
      ), 6) AS h_next
      FROM (SELECT nxt, CAST(sum(num) AS BIGINT) AS col
            FROM trans GROUP BY nxt), tot
    ),
    hcond AS (
      SELECT tr.cur, dn.den,
        round(-sum(
          (CAST(tr.num AS DOUBLE) / dn.den)
          * ln(CAST(tr.num AS DOUBLE) / dn.den)
        ), 6) AS entropy_nats
      FROM trans tr JOIN dn ON dn.cur = tr.cur
      GROUP BY tr.cur, dn.den
    ),
    havg AS (
      SELECT round(-sum(
        (CAST(tr.num AS DOUBLE) / tot.t)
        * ln(CAST(tr.num AS DOUBLE) / dn.den)
      ), 6) AS h_cond
      FROM trans tr JOIN dn ON dn.cur = tr.cur, tot
    )
    SELECT h.cur, CAST(h.den AS BIGINT) AS n_out, h.entropy_nats,
      hnext.h_next, havg.h_cond,
      round(hnext.h_next - havg.h_cond, 6) AS mutual_info
    FROM hcond h, hnext, havg
    """,
)
def q_transition_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information content of the behavioral chain: per-state next-event
    entropy H(next|cur=s), the marginal next-event entropy H(next), the
    average conditional entropy H(next|cur), and their difference — the
    MUTUAL INFORMATION between consecutive events. MI ≈ 0 says the
    event stream is memoryless (transition modeling is pointless);
    high MI says sequence features carry signal. All probabilities are
    exact-integer ratios; the ln/sum float work runs on the ≤|types|²
    transition table, absorbed by round 6.

    Scale shape: one user-keyed lead window + one (cur,nxt) aggregate —
    the corpus exchanges (shared with event_transition_matrix /
    markov_stationary_events); the three entropy rollups and the 1-row
    broadcast joins all run on ≤|types|² rows."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(wu).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("num")
    )
    dn = trans.groupBy("cur").agg(F.sum("num").cast("long").alias("den"))
    tot = trans.agg(F.sum("num").cast("long").alias("t"))
    col = trans.groupBy("nxt").agg(F.sum("num").cast("long").alias("col"))
    pn = F.col("col").cast("double") / F.col("t")
    hnext = col.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum(pn * F.log(pn)), 6).alias("h_next")
    )
    tr = trans.join(F.broadcast(dn), "cur")
    pc = F.col("num").cast("double") / F.col("den")
    hcond = tr.groupBy("cur", "den").agg(
        F.round(-F.sum(pc * F.log(pc)), 6).alias("entropy_nats")
    )
    havg = (
        tr.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(
                    (F.col("num").cast("double") / F.col("t"))
                    * F.log(pc)
                ),
                6,
            ).alias("h_cond")
        )
    )
    return (
        hcond.crossJoin(F.broadcast(hnext))
        .crossJoin(F.broadcast(havg))
        .select(
            "cur",
            F.col("den").cast("long").alias("n_out"),
            "entropy_nats",
            "h_next",
            "h_cond",
            F.round(F.col("h_next") - F.col("h_cond"), 6).alias(
                "mutual_info"
            ),
        )
    )


@register(
    "decision_stump_split",
    """
    WITH d AS (
      SELECT n_chars AS x,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    agg AS (
      SELECT x, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM d GROUP BY x
    ),
    cum AS (
      SELECT x,
        CAST(sum(n) OVER (ORDER BY x) AS BIGINT) AS nl,
        CAST(sum(pos) OVER (ORDER BY x) AS BIGINT) AS pl,
        CAST(sum(n) OVER () AS BIGINT) AS nt,
        CAST(sum(pos) OVER () AS BIGINT) AS pt
      FROM agg
    ),
    cand AS (
      SELECT x AS threshold, nl, pl, nt - nl AS nr, pt - pl AS pr, nt
      FROM cum WHERE nl < nt
    ),
    scored AS (
      SELECT threshold, nl, nr,
        ((((nl * 1000000) // nt)
          * (((2 * pl * 1000000) // nl) * (((nl - pl) * 1000000) // nl)
             // 1000000)) // 1000000)
        + ((((nr * 1000000) // nt)
          * (((2 * pr * 1000000) // nr) * (((nr - pr) * 1000000) // nr)
             // 1000000)) // 1000000) AS gini_fp
      FROM cand
    )
    SELECT threshold, nl AS n_left, nr AS n_right,
      CAST(gini_fp AS BIGINT) AS gini_fp,
      round(CAST(gini_fp AS DOUBLE) / 1000000000000, 6) AS gini,
      CAST(row_number() OVER (ORDER BY gini_fp, threshold) AS BIGINT)
        AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def q_decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump learning: the 5 best binary splits of
    doc length (x ≤ t) against the is-English label by weighted Gini
    impurity — the inner loop of every distributed tree learner
    (XGBoost/LightGBM histogram building), done EXACTLY. Binary Gini
    reduces to 2pq per side; the weighted impurity is assembled in
    staged ×10^6 FIXED-POINT integer arithmetic where every
    intermediate is ≤ 2·10^18 REGARDLESS of corpus size (each factor
    is first floor-divided to ≤10^6 before multiplying — no n² terms),
    so candidate ranking is bit-deterministic across engines and
    partitionings at any scale.

    Scale shape: one (x) hash aggregate over the scan (map-side
    partials) — the corpus exchange; the cumulative-count windows and
    the rank run over |distinct x| rows (the feature's value domain,
    corpus-independent). The same shape batched over F features is
    the histogram pass of GBDT training."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    agg = d.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wo = Window.orderBy("x")
    wt = Window.partitionBy(F.lit(1))
    cum = agg.select(
        "x",
        F.sum("n").over(wo).cast("long").alias("nl"),
        F.sum("pos").over(wo).cast("long").alias("pl"),
        F.sum("n").over(wt).cast("long").alias("nt"),
        F.sum("pos").over(wt).cast("long").alias("pt"),
    )
    cand = cum.filter(F.col("nl") < F.col("nt")).select(
        F.col("x").alias("threshold"),
        "nl",
        "pl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        (F.col("pt") - F.col("pl")).alias("pr"),
        "nt",
    )
    scored = cand.select(
        "threshold",
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.expr(
            "(((nl * 1000000) div nt)"
            " * (((2 * pl * 1000000) div nl)"
            "    * (((nl - pl) * 1000000) div nl) div 1000000)"
            " div 1000000)"
            " + (((nr * 1000000) div nt)"
            " * (((2 * pr * 1000000) div nr)"
            "    * (((nr - pr) * 1000000) div nr) div 1000000)"
            " div 1000000)"
        )
        .cast("long")
        .alias("gini_fp"),
    )
    w = Window.orderBy("gini_fp", "threshold")
    return scored.select(
        "threshold",
        "n_left",
        "n_right",
        "gini_fp",
        F.round(F.col("gini_fp").cast("double") / 1e12, 6).alias("gini"),
        F.row_number().over(w).cast("long").alias("rank"),
    ).filter(F.col("rank") <= 5)


@register(
    "label_centroid_similarity",
    """
    WITH q AS (
      SELECT e.label, t.pos,
        CAST(round(e.embedding[t.pos] * 1000) AS BIGINT) AS qx
      FROM embeddings e,
           unnest(generate_series(1, len(e.embedding))) AS t(pos)
    ),
    per AS (
      SELECT label, pos, CAST(sum(qx) AS BIGINT) AS sq
      FROM q GROUP BY label, pos
    ),
    norms AS (
      SELECT label, CAST(sum(sq * sq) AS BIGINT) AS n2
      FROM per GROUP BY label
    ),
    dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(sum(a.sq * b.sq) AS BIGINT) AS dot
      FROM per a JOIN per b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT d.label_a, d.label_b, d.dot,
      round(CAST(d.dot AS DOUBLE)
            / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)),
            6) AS cosine
    FROM dots d
    JOIN norms na ON na.label = d.label_a
    JOIN norms nb ON nb.label = d.label_b
    """,
)
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids — the class-confusability matrix (labels whose centroids
    nearly coincide are what the classifier will mix up, and what
    semdedup-style pruning treats as one region). Centroid cosine
    equals the cosine of per-label SUM vectors (the 1/n factors
    cancel), so with thousandths quantization every dot product and
    norm is an EXACT BIGINT — the single rounded division at the end
    is the only float op. Quantization bound: |Σqx| ≤ 10^3·n per cell
    keeps sums within BIGINT to ~10^12 vectors per label.

    Scale shape: one posexplode into a (label,pos) aggregate — the
    corpus exchange; dots/norms are self-joins of the |labels|·|dims|
    sum table (dimension-sized at any corpus scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000).cast("long").alias("qx"),
    )
    per = q.groupBy("label", "pos").agg(
        F.sum("qx").cast("long").alias("sq")
    )
    norms = per.groupBy("label").agg(
        F.sum(F.col("sq") * F.col("sq")).cast("long").alias("n2")
    )
    a = per.select(
        F.col("label").alias("label_a"), "pos", F.col("sq").alias("sa")
    )
    b = per.select(
        F.col("label").alias("label_b"), "pos", F.col("sq").alias("sb")
    )
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("n2").alias("nb2")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            "dot",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("na2").cast("double") * F.col("nb2").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )


@register(
    "cusum_changepoint",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT event_type, h, x,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
             AS BIGINT) AS t,
        CAST(sum(x) OVER (PARTITION BY event_type ORDER BY h)
             AS BIGINT) AS prefix,
        CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hourly
    ),
    scored AS (
      SELECT event_type, h, n,
        abs(n * prefix - t * tot) AS cusum_n
      FROM pre
    )
    SELECT event_type, h AS change_hour, n AS n_hours,
      CAST(cusum_n AS BIGINT) AS cusum_peak_n,
      round(CAST(cusum_n AS DOUBLE) / n, 6) AS cusum_peak
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY cusum_n DESC, h) = 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the hourly volume series, per
    event type: the hour t maximizing |S_t| where S_t = Σ_{i≤t}(x_i−x̄)
    — the standard "when did the level shift" estimator. Scaled by n:
    n·S_t = n·prefix_t − t·total is EXACT INTEGER, so the peak and its
    argmax (tie-broken by hour) are bit-deterministic across engines —
    no float mean subtraction anywhere; the reported peak magnitude is
    one final division.

    Scale shape: one (type,hour) corpus aggregate; the prefix/total
    windows and the per-type argmax run on the |types|·|hours| hourly
    table in one type-keyed sort."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("h")
    wt = Window.partitionBy("event_type")
    pre = hourly.select(
        "event_type",
        "h",
        F.row_number().over(wo).cast("long").alias("t"),
        F.sum("x").over(wo).cast("long").alias("prefix"),
        F.sum("x").over(wt).cast("long").alias("tot"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
    )
    scored = pre.select(
        "event_type",
        "h",
        "n",
        F.abs(
            F.col("n") * F.col("prefix") - F.col("t") * F.col("tot")
        ).alias("cusum_n"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("cusum_n"), "h"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").alias("change_hour"),
            F.col("n").alias("n_hours"),
            F.col("cusum_n").cast("long").alias("cusum_peak_n"),
            F.round(F.col("cusum_n").cast("double") / F.col("n"), 6).alias(
                "cusum_peak"
            ),
        )
    )


@register(
    "seasonal_strength_eta",
    """
    WITH hourly AS (
      SELECT event_type,
        date_trunc('hour', ts) AS h,
        (dayofweek(ts) * 24 + hour(ts)) AS how,
        CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT event_type, how,
        CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(x) AS BIGINT) AS sx,
        CAST(sum(x * x) AS BIGINT) AS sxx
      FROM hourly GROUP BY event_type, how
    )
    SELECT event_type,
      CAST(sum(ng) AS BIGINT) AS n_hours,
      CAST(count(*) AS BIGINT) AS n_cells,
      round(
        (sum(CAST(sx AS DOUBLE) * sx / ng)
         - CAST(sum(sx) AS DOUBLE) * sum(sx) / sum(ng))
        / (sum(sxx)
           - CAST(sum(sx) AS DOUBLE) * sum(sx) / sum(ng)), 6)
        AS seasonal_eta2
    FROM g GROUP BY event_type
    """,
)
def q_seasonal_strength_eta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength as variance explained: per event type, the
    eta² of the hour-of-week profile over the hourly volume series
    (one-way ANOVA of counts grouped by the 168 weekly slots) — the
    model-free counterpart to seasonality_autocorr: eta² ≈ 1 says a
    weekly profile explains the series (seasonal_naive will work);
    eta² ≈ 0 says volume is rhythm-free. All sufficient statistics are
    exact BIGINT (integer hourly counts); the assembly is three exact
    divisions on the ≤|types|·168 group table.

    Scale shape: one (type,hour) corpus aggregate, one (type,slot)
    rollup of that table, one |types|-row output. Two map-side-partial
    exchanges of dimension-sized data."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        ((F.dayofweek("ts") - 1) * 24 + F.hour("ts")).alias("how"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    g = hourly.groupBy("event_type", "how").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    ssb_num = F.sum(
        F.col("sx").cast("double") * F.col("sx") / F.col("ng")
    ) - F.sum("sx").cast("double") * F.sum("sx") / F.sum("ng")
    sst = (
        F.sum("sxx")
        - F.sum("sx").cast("double") * F.sum("sx") / F.sum("ng")
    )
    return g.groupBy("event_type").agg(
        F.sum("ng").cast("long").alias("n_hours"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(ssb_num / sst, 6).alias("seasonal_eta2"),
    )


@register(
    "bitmap_intersect_users",
    """
    WITH words AS (
      SELECT event_type, user_id // 32 AS w,
        CAST(bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS BIGINT)
          AS bits
      FROM events GROUP BY event_type, user_id // 32
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
      CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_common_users
    FROM words a
    JOIN words b ON a.w = b.w AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q_bitmap_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix via BITMAP INDEX arithmetic: per
    event type, the distinct-user set is packed into 32-bit words
    (bit_or of 1<<(id mod 32) grouped by id div 32 — the roaring-bitmap
    layout in plain SQL; 32-bit lanes because a set bit 63 overflows
    DuckDB's CHECKED signed shift while Spark wraps silently — found
    cross-engine), and every pairwise intersection cardinality
    is popcount(AND) summed over co-located words. This is how
    warehouse engines answer N² segment-overlap questions without N²
    distinct-counting passes: the corpus is read ONCE, the pairwise
    work runs on |types|·|users|/64 words. Exact counterpart to the
    KMV sketch estimate (kmv_type_user_overlap).

    Scale shape: one (type, word) aggregate over the scan (map-side
    bit_or partials — bit_or is commutative/associative, so partition
    order is irrelevant); the pair join is word-aligned equi-join on
    the packed table, 32× smaller than the id list."""
    ev = load_table(spark, sf_dir, "events")
    words = ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, CAST(user_id % 32 AS INT)))"
        )
        .cast("long")
        .alias("bits")
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "w", F.col("bits").alias("ba")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "w", F.col("bits").alias("bb")
    )
    return (
        a.join(b, "w")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
            .cast("long")
            .alias("n_common_users")
        )
    )


@register(
    "peak_concurrency",
    """
    WITH sess AS (
      SELECT user_id, min(ts) AS s, max(ts) + INTERVAL 30 MINUTE AS e
      FROM (
        SELECT user_id, ts,
          sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        FROM (
          SELECT user_id, ts, event_id,
            date_diff('second',
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
              ts) AS gap
          FROM events
        )
      ) GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM sess
      UNION ALL
      SELECT e AS t, -1 AS d FROM sess
    ),
    sweep AS (
      SELECT t, CAST(sum(sum(d)) OVER (ORDER BY t) AS BIGINT)
        AS concurrency
      FROM deltas GROUP BY t
    )
    SELECT t AS peak_start, concurrency AS peak_concurrency,
      (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions
    FROM sweep
    QUALIFY row_number() OVER (ORDER BY concurrency DESC, t) = 1
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions by SWEEP-LINE: gap-30min sessionization
    per user, then +1/−1 deltas at session starts/ends (end = last
    event + 30 min), a time-ordered running sum, and the argmax — the
    capacity-planning number ("how many users are on AT ONCE") that
    per-hour counts systematically underestimate. All integers; ties
    broken by earliest time. Ends are closed at start instants by
    summing per-timestamp deltas BEFORE the running sum, so a session
    ending exactly when another starts never yields a phantom dip.

    Scale shape: one user-keyed exchange for sessionization; the
    sweep is the engine's TWO-PASS global_running_sum (range partition
    + local cumsum + broadcast offsets — never a no-partition window)
    over per-timestamp deltas, and the argmax is orderBy().limit(1) →
    TakeOrderedAndProject. Nothing global-sorts raw events."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(wu))
        ).alias("gap"),
    )
    sess = (
        gaps.withColumn(
            "sid",
            F.sum(
                F.when(
                    F.col("gap").isNull() | (F.col("gap") > 1800), 1
                ).otherwise(0)
            ).over(wu),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
    )
    deltas = sess.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    from ..operators.ranking import global_running_sum

    per_t = deltas.groupBy("t").agg(F.sum("d").alias("dd"))
    sweep = global_running_sum(per_t, ["t"], "dd", "concurrency").select(
        "t", F.col("concurrency").cast("long").alias("concurrency")
    )
    n_sess = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return (
        sweep.orderBy(F.desc("concurrency"), "t")
        .limit(1)
        .crossJoin(F.broadcast(n_sess))
        .select(
            F.col("t").alias("peak_start"),
            F.col("concurrency").alias("peak_concurrency"),
            "n_sessions",
        )
    )


@register(
    "growth_accounting_dau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
      SELECT user_id, d,
        lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM ud
    ),
    flows AS (
      SELECT d,
        CAST(sum(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(sum(CASE WHEN prev_d = d - INTERVAL 1 DAY THEN 1 ELSE 0 END)
          AS BIGINT) AS n_retained,
        CAST(sum(CASE WHEN prev_d IS NOT NULL
                       AND prev_d < d - INTERVAL 1 DAY THEN 1 ELSE 0 END)
          AS BIGINT) AS n_resurrected,
        CAST(count(*) AS BIGINT) AS dau
      FROM seq GROUP BY d
    ),
    churn AS (
      SELECT d + INTERVAL 1 DAY AS d, CAST(count(*) AS BIGINT) AS n_churned
      FROM (
        SELECT user_id, d,
          lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
        FROM ud
      )
      WHERE next_d IS NULL OR next_d > d + INTERVAL 1 DAY
      GROUP BY d + INTERVAL 1 DAY
    )
    SELECT CAST(f.d AS DATE) AS day, f.dau, f.n_new, f.n_retained,
      f.n_resurrected, coalesce(c.n_churned, 0) AS n_churned
    FROM flows f LEFT JOIN churn c ON c.d = f.d
    """,
)
def q_growth_accounting_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the Social-Capital framework): every day's
    DAU decomposed into NEW (first day ever), RETAINED (active
    yesterday), RESURRECTED (returning after a gap), plus CHURNED
    (active yesterday, not today) — the identity DAU_t = new_t +
    retained_t + resurrected_t and DAU_t − DAU_{t−1} = new + resurrected
    − churned that every growth dashboard is built on. All exact
    integer counts on the distinct (user, day) activity table.

    Scale shape: one distinct (user,day) aggregate over events, then
    lag AND lead share one user-keyed sort (same window spec); the
    per-day rollups and the 1-day-offset left join run on |days|-sized
    frames. Churn for day d is derived from day d−1's rows, so no
    full-calendar spine or self-join of activity is needed."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("d")
    seq = ud.select(
        "user_id",
        "d",
        F.lag("d").over(wu).alias("prev_d"),
        F.lead("d").over(wu).alias("next_d"),
    )
    flows = seq.groupBy("d").agg(
        F.sum(F.when(F.col("prev_d").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(
            F.when(
                F.col("prev_d") == F.date_sub(F.col("d"), 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.col("prev_d") < F.date_sub(F.col("d"), 1)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("long").alias("dau"),
    )
    churn = (
        seq.filter(
            F.col("next_d").isNull()
            | (F.col("next_d") > F.date_add(F.col("d"), 1))
        )
        .groupBy(F.date_add(F.col("d"), 1).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        flows.join(F.broadcast(churn), "d", "left")
        .select(
            F.col("d").alias("day"),
            "dau",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("long")
            .alias("n_churned"),
        )
    )


@register(
    "degree_powerlaw_mle",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE substr(md5(CAST(l_partkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    ),
    e AS (
      SELECT DISTINCT a.l_partkey pa, b.l_partkey pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT pa AS u FROM e UNION ALL SELECT pb FROM e
      ) GROUP BY u
    ),
    mn AS (SELECT CAST(min(d) AS BIGINT) AS dmin FROM deg)
    SELECT
      CAST(count(*) AS BIGINT) AS n_nodes,
      CAST(max(mn.dmin) AS BIGINT) AS d_min,
      CAST(max(d) AS BIGINT) AS d_max,
      round(avg(CAST(d AS DOUBLE)), 6) AS d_mean,
      round(1 + count(*) /
        sum(ln(CAST(d AS DOUBLE) / (mn.dmin - 0.5))), 6)
        AS alpha_mle
    FROM deg, mn GROUP BY mn.dmin
    """,
)
def q_degree_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law fit for the co-purchase graph:
    the Clauset–Shalizi–Newman discrete MLE α = 1 + n/Σ ln(d/(dmin−½))
    plus the degree summary — the one-row answer to "is this graph
    scale-free enough that hub-aware strategies (salting, hub capping,
    degree-ordered wedges) matter". The ln-sum is the only float
    accumulation (|V| terms, magnitude ~1), absorbed by round 6;
    every other statistic is exact integer.

    Scale shape: the standard md5-sampled edge build (shared with the
    triangle/k-core/PageRank family), a per-node degree aggregate, a
    1-row min broadcast, and a single |V|-row rollup."""
    e = copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("u"))
        .unionAll(e.select(F.col("pb").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    mn = deg.agg(F.min("d").cast("long").alias("dmin"))
    j = deg.crossJoin(F.broadcast(mn))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("dmin").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.round(F.avg(F.col("d").cast("double")), 6).alias("d_mean"),
        F.round(
            1
            + F.count(F.lit(1))
            / F.sum(
                F.log(
                    F.col("d").cast("double") / (F.col("dmin") - 0.5)
                )
            ),
            6,
        ).alias("alpha_mle"),
    )


@register(
    "skyline_pareto_docs",
    """
    WITH pts AS (
      SELECT doc_id, n_chars AS x,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, x, y,
        max(y) OVER (ORDER BY x
                     RANGE BETWEEN 1 FOLLOWING
                               AND UNBOUNDED FOLLOWING) AS best_above,
        max(y) OVER (PARTITION BY x) AS best_same_x
      FROM pts
    )
    SELECT doc_id, x AS n_chars, y AS n_distinct_tokens
    FROM ranked
    WHERE (best_above IS NULL OR y > best_above) AND y = best_same_x
    """,
)
def q_skyline_pareto_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) operator: documents not strictly
    dominated on (length, vocabulary richness) — the multi-criteria
    "best documents" cut that no single score captures (a doc survives
    iff nothing is ≥ on both axes and > on one). The classic sort-based
    reduction: a point survives iff its y strictly beats the best y
    among all strictly-larger x (RANGE 1 FOLLOWING → UNBOUNDED window
    over integer x) AND ties the best y at its own x — no O(n²)
    NOT-EXISTS self-join. All-integer comparisons: the frontier is
    bit-deterministic.

    Scale shape: one scan computing (x, y) per doc; the strictly-
    greater suffix max is the engine's TWO-PASS global_max_over_greater
    (operators/ranking.py — range partition + per-partition suffix max
    + broadcast triangular max join; equal keys colocate, so higher
    partitions are strictly greater), never a no-partition window. The
    dominance test is two lookups per row — linear, vs the naive
    quadratic skyline join."""
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("y"),
    )
    from ..operators.ranking import global_max_over_greater

    w_same = Window.partitionBy("x")
    ranked = global_max_over_greater(pts, "x", "y", "best_above").select(
        "doc_id",
        "x",
        "y",
        "best_above",
        F.max("y").over(w_same).alias("best_same_x"),
    )
    return ranked.filter(
        (F.col("best_above").isNull() | (F.col("y") > F.col("best_above")))
        & (F.col("y") == F.col("best_same_x"))
    ).select(
        "doc_id",
        F.col("x").alias("n_chars"),
        F.col("y").alias("n_distinct_tokens"),
    )


@register(
    "overdispersion_index",
    """
    WITH per AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_users,
      CAST(sum(c) AS BIGINT) AS n_events,
      round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS mean_c,
      round(CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
            / (CAST(count(*) AS DOUBLE) * (count(*) - 1)), 6)
        AS var_c,
      round((CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * (count(*) - 1)))
            / (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS vmr
    FROM per GROUP BY event_type
    """,
)
def q_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen on per-user event counts: sample variance
    / mean (VMR) per event type — Poisson traffic has VMR ≈ 1;
    VMR ≫ 1 means bursty/heavy-tailed users (negative-binomial world:
    rate limits and per-user caps matter), VMR ≪ 1 means suspiciously
    regular (bot schedules). Both moments come from exact BIGINT
    sufficient statistics (n·Σc² − (Σc)²); the three outputs are final
    exact-integer divisions.

    Scale shape: one (type,user) aggregate over the scan, one
    |types|-row rollup of that table — two map-side-partial exchanges,
    no window, no join."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = F.count(F.lit(1))
    sc, scc = F.sum("c"), F.sum(F.col("c") * F.col("c"))
    var = (n * scc - sc * sc).cast("double") / (
        n.cast("double") * (n - 1)
    )
    return per.groupBy("event_type").agg(
        n.cast("long").alias("n_users"),
        sc.cast("long").alias("n_events"),
        F.round(sc.cast("double") / n, 6).alias("mean_c"),
        F.round(var, 6).alias("var_c"),
        F.round(var / (sc.cast("double") / n), 6).alias("vmr"),
    )


@register(
    "time_weighted_avg_value",
    """
    WITH seq AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS nxt
      FROM events
    ),
    seg AS (
      SELECT user_id, v,
        CAST(date_diff('microseconds', ts, nxt) AS BIGINT) AS dur
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
      CAST(count(*) AS BIGINT) AS n_segments,
      CAST(sum(dur) AS BIGINT) AS span_us,
      round(CAST(CAST(sum(v * dur) AS DECIMAL(38,2)) AS DOUBLE)
            / sum(dur), 6) AS twap
    FROM seg GROUP BY user_id
    HAVING sum(dur) > 0
    """,
)
def q_time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the financial/IoT
    standard): each reading is held until the next event, weighted by
    its holding duration in exact integer MICROSECONDS, so irregular
    sampling doesn't bias the mean the way a plain AVG does. The
    weighted sum is DECIMAL(18,2)·BIGINT — exact — and the single
    double division happens last. Users with a zero-length span (all
    events simultaneous) are excluded exactly on both engines.

    Scale shape: one user-keyed exchange shared by the lead window and
    the per-user aggregate; no join, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.lead("ts").over(wu).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    seg = seq.select(
        "user_id",
        "v",
        (F.unix_micros("nxt") - F.unix_micros("ts")).alias("dur"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("dur").cast("long").alias("span_us"),
            F.round(
                F.sum(F.col("v") * F.col("dur"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.sum("dur"),
                6,
            ).alias("twap"),
        )
        .filter(F.col("span_us") > 0)
    )


@register(
    "bellman_ford_cheapest_path",
    """
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE substr(md5(CAST(l_partkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    ),
    pairs AS (
      SELECT a.l_partkey pa, b.l_partkey pb,
             CAST(count(*) AS BIGINT) AS co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    e AS (
      SELECT pa AS src, pb AS dst, 1000000 // co AS w FROM pairs
      UNION ALL
      SELECT pb, pa, 1000000 // co FROM pairs
    ),
    seeds AS (
      SELECT DISTINCT src AS node FROM e
      WHERE substr(md5(CAST(src AS VARCHAR)), 3, 1) = '0'
    ),
    reach(k, node, cost) AS (
      SELECT 0, node, CAST(0 AS BIGINT) FROM seeds
      UNION ALL
      SELECT r.k + 1, e.dst, CAST(min(r.cost + e.w) AS BIGINT)
      FROM reach r JOIN e ON e.src = r.node
      WHERE r.k < 4
      GROUP BY r.k + 1, e.dst
    ),
    best AS (
      SELECT node, CAST(min(cost) AS BIGINT) AS cost
      FROM reach GROUP BY node
    )
    SELECT node AS part, cost,
      CAST(row_number() OVER (ORDER BY cost, node) AS BIGINT) AS rank
    FROM best QUALIFY rank <= 20
    """,
)
def q_bellman_ford_cheapest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (≤4 hops) on the co-purchase graph by
    Bellman–Ford rounds: edge cost = 10^6 div co-purchase-count (strong
    ties are cheap), seeds = md5-selected nodes at cost 0, each round
    relaxes the frontier through every edge and keeps the per-node min.
    Integer weights and integer min ⇒ every round is bit-deterministic
    (float path sums would be order-dependent); the top-20 cheapest
    reachable parts tie-break on node id. Complements bfs_hops
    (unweighted hops) with the weighted metric a recommender actually
    ranks by.

    Scale shape: the md5-sampled edge build (shared family recipe),
    then 4 rounds of frontier⋈edges + per-node min — the same bounded-
    frontier discipline as bfs_hops/pagerank (frontier localCheckpoint
    per round, one join + one aggregate each); the oracle replays the
    identical recurrence as a recursive CTE with min-aggregation."""
    pairs = copurchase_pair_counts(spark, sf_dir)
    # r13 (VERDICT r12 #7, the bfs_hops discipline): every checkpoint
    # here is LAZY — the round count is fixed (no per-round driver
    # decision) and `best` is a plan-level UNION of all the frontier
    # checkpoints, so every block set IS the result and the single
    # final action materializes the whole chain in one pipelined job
    # instead of 6 blocking checkpoint jobs. No frees needed (nothing
    # is superseded); checkpoints still bound plan depth per round.
    e = (
        pairs.select(
            F.col("pa").alias("src"),
            F.col("pb").alias("dst"),
            F.expr("1000000L div co").alias("w"),
        )
        .unionAll(
            pairs.select(
                F.col("pb").alias("src"),
                F.col("pa").alias("dst"),
                F.expr("1000000L div co").alias("w"),
            )
        )
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    seeds = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .filter(
            F.substring(F.md5(F.col("node").cast("string")), 3, 1) == "0"
        )
    )
    frontier = seeds.select(
        "node", F.lit(0).cast("long").alias("cost")
    ).localCheckpoint(eager=False)
    best = frontier
    for _ in range(4):
        frontier = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").cast("long").alias("cost"))
            .localCheckpoint(eager=False)
        )
        best = best.unionAll(frontier)
    best = best.groupBy("node").agg(
        F.min("cost").cast("long").alias("cost")
    )
    # top-20 via orderBy().limit() — TakeOrderedAndProject (per-partition
    # heaps + driver merge of 20-row candidates), so the rank window
    # below runs on exactly 20 rows, never the full reached-node set
    top = best.orderBy("cost", "node").limit(20)
    w = Window.orderBy("cost", "node")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(F.col("node").alias("part"), "cost", "rank")
    )


@register(
    "share_of_parent_revenue",
    """
    WITH nat AS (
      SELECT r_name, n_name,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(38,2)) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
      CAST(rev AS DOUBLE) AS nation_revenue,
      CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)
        AS region_revenue,
      round(CAST(rev AS DOUBLE)
            / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
        AS share_of_region,
      round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE), 6)
        AS share_of_total
    FROM nat
    """,
)
def q_share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis through the geography hierarchy: each
    nation's revenue as a share of its region and of the total — the
    percent-of-parent columns every OLAP drill-down report carries
    beside the rollup. Revenue is a DECIMAL partial sum; the parent
    and grand totals are window sums over the |nations|-row aggregate
    (exact decimal), rendered to double once for the two share
    divisions.

    Scale shape: orders joins three broadcast dims, ONE (region,
    nation) hash aggregate with map-side partials — the only corpus
    exchange; both share windows run on ≤ |nations| rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        cust.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("c_custkey", "r_name", "n_name")
    )
    nat = (
        orders.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy(F.lit(1))
    rev_d = F.col("rev").cast("double")
    reg_d = F.sum("rev").over(wr).cast("double")
    tot_d = F.sum("rev").over(wt).cast("double")
    return nat.select(
        "r_name",
        "n_name",
        rev_d.alias("nation_revenue"),
        reg_d.alias("region_revenue"),
        F.round(rev_d / reg_d, 6).alias("share_of_region"),
        F.round(rev_d / tot_d, 6).alias("share_of_total"),
    )


@register(
    "mannwhitney_u_click_view",
    """
    WITH arms AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    g AS (
      SELECT value, count(*) AS t, sum(a) AS n1v FROM arms GROUP BY value
    ),
    c AS (
      SELECT value, t, n1v,
        sum(t) OVER (ORDER BY value) - t AS nb
      FROM g
    ),
    s AS (
      SELECT
        CAST(sum(n1v) AS BIGINT) AS n1,
        CAST(sum(t - n1v) AS BIGINT) AS n2,
        CAST(sum(CAST(n1v AS DECIMAL(12,0))
                 * CAST(2 * nb + t + 1 AS DECIMAL(15,0))) AS DOUBLE) AS r1x2,
        CAST(sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                 * CAST(t AS DECIMAL(12,0)) - t) AS DOUBLE) AS ties
      FROM c
    )
    SELECT n1, n2,
      (r1x2 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1,
      round(
        ((r1x2 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
         - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
               * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                  - ties / (CAST(n1 + n2 AS DOUBLE)
                            * (CAST(n1 + n2 AS DOUBLE) - 1.0)))),
        6) AS z
    FROM s
    """,
)
def q_mannwhitney_u_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click-arm vs view-arm `value`),
    tie-corrected — the nonparametric complement to
    `two_proportion_ztest` for skewed metrics where a t-test's
    normality assumption fails. Everything up to the final scalar is
    EXACT integer arithmetic: ranks never materialize per row; the
    doubled rank-sum identity 2·R1 = Σ_v n1(v)·(2·below(v) + t(v) + 1)
    needs only per-distinct-value counts, with ties entering through
    Σ(t³−t). The five exact aggregates convert to double once and the
    z-statistic is a single identical expression tree in both engines
    (sqrt is IEEE-correctly-rounded, so cross-engine bit parity holds).

    Scale shape: one hash aggregate on distinct values, then the
    TWO-PASS global_running_sum (range partition + per-partition cumsum
    + triangular offset join) for below-counts — no single-partition
    window anywhere — and a 1-row final reduce. Bounds: per-arm counts
    ≤ 1e12 and tie groups ≤ 1e12 keep every DECIMAL product inside
    38 digits."""
    from ..operators.ranking import global_running_sum

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        )
    )
    g = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"), F.sum("a").alias("n1v")
    )
    c = global_running_sum(g, ["value"], "t", "cum").withColumn(
        "nb", F.col("cum") - F.col("t")
    )
    td = F.col("t").cast("decimal(12,0)")
    s = c.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("t") - F.col("n1v")).alias("n2"),
        F.sum(
            F.col("n1v").cast("decimal(12,0)")
            * (2 * F.col("nb") + F.col("t") + 1).cast("decimal(15,0)")
        )
        .cast("double")
        .alias("r1x2"),
        F.sum(td * td * td - F.col("t")).cast("double").alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (F.col("r1x2") - n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("ties") / (nd * (nd - F.lit(1.0)))
        )
    )
    z = (u1 - n1d * n2d / F.lit(2.0)) / F.sqrt(var)
    return s.select("n1", "n2", u1.alias("u1"), F.round(z, 6).alias("z"))


def _doubled_avg_rank(df, col: str, out: str):
    """Doubled tie-average rank of `col` WITHIN event_type, computed
    without per-type windows: 2·avgrank = 2·below + t + 1 over distinct
    (event_type, col) groups, where `below` = global running count in
    (event_type, col) order minus the current group minus the total of
    all lexicographically-earlier types (a |types|² triangular
    broadcast join — never a no-partition window). Doubling keeps the
    half-integer tie averages in exact BIGINT."""
    from ..operators.ranking import global_running_sum

    g = df.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("t"))
    c = global_running_sum(g, ["event_type", col], "t", "cum")
    tot = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(
            F.broadcast(b), F.col("b.event_type") < F.col("a.event_type"), "left"
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.coalesce(F.sum("b.nt"), F.lit(0)).alias("off"))
    )
    below = F.col("cum") - F.col("t") - F.col("off")
    return c.join(F.broadcast(off), "event_type").select(
        "event_type", col, (2 * below + F.col("t") + 1).alias(out)
    )


@register(
    "spearman_value_vs_time",
    """
    WITH e AS (
      SELECT event_type, value, epoch_us(ts) AS us
      FROM events WHERE value IS NOT NULL
    ),
    cx AS (
      SELECT event_type, value,
        2 * (sum(t) OVER (PARTITION BY event_type ORDER BY value) - t)
          + t + 1 AS rx2
      FROM (SELECT event_type, value, count(*) AS t FROM e GROUP BY 1, 2)
    ),
    cy AS (
      SELECT event_type, us,
        2 * (sum(t) OVER (PARTITION BY event_type ORDER BY us) - t)
          + t + 1 AS ry2
      FROM (SELECT event_type, us, count(*) AS t FROM e GROUP BY 1, 2)
    ),
    r AS (
      SELECT e.event_type,
        CAST(rx2 AS DECIMAL(16,0)) AS rx2, CAST(ry2 AS DECIMAL(16,0)) AS ry2
      FROM e
      JOIN cx ON e.event_type = cx.event_type AND e.value = cx.value
      JOIN cy ON e.event_type = cy.event_type AND e.us = cy.us
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS nd,
        CAST(sum(rx2) AS DOUBLE) AS sx, CAST(sum(ry2) AS DOUBLE) AS sy,
        CAST(sum(rx2 * rx2) AS DOUBLE) AS sxx,
        CAST(sum(ry2 * ry2) AS DOUBLE) AS syy,
        CAST(sum(rx2 * ry2) AS DOUBLE) AS sxy
      FROM r GROUP BY event_type
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n,
      round((nd * sxy - sx * sy)
            / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6)
        AS spearman_rho
    FROM s
    """,
)
def q_spearman_value_vs_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between `value` and event time, per
    event type — the monotone-trend detector (is the metric drifting
    over time?) robust to outliers and any monotone transform, where
    `regr_value_vs_time`'s Pearson slope is not. Tie handling is the
    textbook average-rank: both rank columns are the DOUBLED tie
    averages (exact BIGINT), the five per-type moments accumulate in
    DECIMAL(38,0) (the ×2 scale cancels algebraically in rho), and the
    final rho is one identical double expression tree in both engines.

    Scale shape: two hash aggregates on distinct (type, value) /
    (type, us), each ranked by the two-pass global_running_sum in
    (type, key) order (one range exchange each; within-type offsets
    via a |types|² triangular broadcast join — no per-type window, so
    a 5-type 100 TB table never funnels a type into one task), two
    keyed equi-joins back to rows, one per-type reduce. DECIMAL bound:
    rows per type ≤ ~4e9 keeps n·Σ(rx2·ry2) inside 38 digits; beyond
    that the moments convert to double earlier (documented, not
    silent)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", F.unix_micros("ts").alias("us"))
    )
    rx = _doubled_avg_rank(ev, "value", "rx2")
    ry = _doubled_avg_rank(ev, "us", "ry2")
    rows = ev.join(rx, ["event_type", "value"]).join(ry, ["event_type", "us"])
    d16 = lambda c: F.col(c).cast("decimal(16,0)")  # noqa: E731
    s = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(d16("rx2")).cast("double").alias("sx"),
        F.sum(d16("ry2")).cast("double").alias("sy"),
        F.sum(d16("rx2") * d16("rx2")).cast("double").alias("sxx"),
        F.sum(d16("ry2") * d16("ry2")).cast("double").alias("syy"),
        F.sum(d16("rx2") * d16("ry2")).cast("double").alias("sxy"),
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    rho = (nd * F.col("sxy") - sx * sy) / F.sqrt(
        (nd * F.col("sxx") - sx * sx) * (nd * F.col("syy") - sy * sy)
    )
    return s.select(
        "event_type",
        nd.cast("bigint").alias("n"),
        F.round(rho, 6).alias("spearman_rho"),
    )


@register(
    "ewma_user_value",
    """
    SELECT user_id, count(*) AS n_events,
      round(list_reduce(
              list_prepend(0.0, list(value ORDER BY epoch_us(ts), event_id)),
              (s, x) -> s / 2 + x / 2),
            6) AS ewma
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
    """,
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of `value`
    (α = 1/2, zero-initialized) — the classic streaming smoother, here
    as a batch fold. α = 1/2 makes every step s' = s/2 + v/2 a pair of
    exact exponent shifts plus ONE IEEE addition, and the fold runs in
    explicit (ts, event_id) order on both engines, so the result is
    bit-deterministic and cross-engine exact — no "approximately
    equal" tolerance needed for a recurrence no window frame can
    express.

    Scale shape: one user-keyed hash aggregate building the sorted
    per-user list, then a linear in-memory fold per user — total work
    O(rows), state O(max events per user) (bounded by retention in
    the event-table domain; the streaming twin in
    streaming/stateful.py holds ONE scalar per user instead)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            "value",
        )
    )
    arr = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("us", "event_id", "value"))
        ).alias("a"),
    )
    ewma = F.aggregate(
        F.col("a"),
        F.lit(0.0),
        lambda s, x: s / F.lit(2.0) + x["value"] / F.lit(2.0),
    )
    return arr.select(
        "user_id", "n_events", F.round(ewma, 6).alias("ewma")
    )


@register(
    "kendall_tau_daily_volume",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
        sum(CASE WHEN b.cnt > a.cnt THEN 1 ELSE 0 END) AS c,
        sum(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END) AS d
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ),
    n AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
    t AS (
      SELECT event_type,
        CAST(sum(m * (m - 1) / 2) AS BIGINT) AS ties
      FROM (SELECT event_type, cnt, count(*) AS m FROM d GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT n.event_type, n.n AS n_days,
      CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
      round((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)
                   * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                      - CAST(ties AS DOUBLE))),
            6) AS tau_b
    FROM n JOIN p USING (event_type) JOIN t USING (event_type)
    """,
)
def q_kendall_tau_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between calendar day and daily event volume, per
    event type — the rank-robust trend test whose O(n²) pair
    enumeration is usually disqualifying; here n = DAYS (calendar-
    bounded, not corpus-bounded), so the within-type pair self-join is
    |days|² per type regardless of table size. Day keys are unique
    within a type (x has no ties), volume ties enter via the tau-b
    denominator term Σm(m−1)/2. Concordant/discordant counts are exact
    integers; the final statistic is one identical double tree.

    Scale shape: one (type, day) hash aggregate over the corpus — the
    only full-table exchange — then joins on frames of |types|·|days|
    rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    d = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = d.alias("a"), d.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.cnt") > F.col("a.cnt"), 1).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when(F.col("b.cnt") < F.col("a.cnt"), 1).otherwise(0)
            ).alias("d"),
        )
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    t = (
        d.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("m"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("m") * (F.col("m") - 1) / 2)
            .cast("bigint")
            .alias("ties")
        )
    )
    j = n.join(p, "event_type").join(t, "event_type")
    nd = F.col("n").cast("double")
    n0 = nd * (nd - F.lit(1.0)) / F.lit(2.0)
    tau = (F.col("c").cast("double") - F.col("d").cast("double")) / F.sqrt(
        n0 * (n0 - F.col("ties").cast("double"))
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


def _logloss_oracle() -> str:
    """DuckDB replica of the binned log-loss/Brier evaluation: the
    identical feature arithmetic and logit chain as _auc_oracle, then
    integer-unit logit bins with Laplace-smoothed empirical rates."""
    from ..operators.models import FROZEN_COEFS, FROZEN_INTERCEPT
    from ..operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    c_dtr, c_tts, c_nt, c_swr = (repr(c) for c in FROZEN_COEFS)
    z = (
        f"{FROZEN_INTERCEPT!r} + {c_dtr} * dtr + {c_tts} * tts"
        f" + {c_nt} * n_tok + {c_swr} * swr"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id, toks,
      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
      CAST(list_max(list_transform(list_distinct(toks),
        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks) AS tts,
      CAST(len(toks) AS DOUBLE) AS n_tok,
      CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) AS swr
    FROM t),
    lab AS (SELECT CAST(floor({z}) AS BIGINT) AS bin,
      CASE WHEN (CASE WHEN len(toks) < 2 THEN 0.0 ELSE
        1.0 - CAST(len(list_distinct(list_transform(
          generate_series(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
          / (len(toks) - 1) END) > {_QUALITY_LABEL_THRESHOLD}
        THEN 1 ELSE 0 END AS pos
    FROM f),
    g AS (
      SELECT bin, CAST(count(*) AS DOUBLE) AS nb,
             CAST(sum(pos) AS DOUBLE) AS pb
      FROM lab GROUP BY bin
    ),
    e AS (
      SELECT nb, pb, (pb + 1.0) / (nb + 2.0) AS p FROM g
    )
    SELECT CAST(sum(nb) AS BIGINT) AS n_docs,
      CAST(sum(pb) AS BIGINT) AS n_pos,
      CAST(count(*) AS BIGINT) AS n_bins,
      round(-sum(pb * ln(p) + (nb - pb) * ln(1.0 - p)) / sum(nb), 6)
        AS logloss,
      round(sum(pb * (1.0 - p) * (1.0 - p) + (nb - pb) * p * p) / sum(nb), 6)
        AS brier
    FROM e
    """


@register("classifier_logloss_brier", _logloss_oracle())
def q_classifier_logloss_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-loss and Brier score of the frozen quality classifier — the
    proper-scoring-rule readout that complements ranking quality
    (classifier_auc_exact) and calibration (quality_calibration_bins):
    both penalize CONFIDENT wrong predictions, which an AUC cannot
    see. Probabilities come from integer-unit logit bins with Laplace
    smoothing p = (pos+1)/(n+2) — exact rationals of integer counts,
    never a cross-engine exp(): sigmoid would be the one
    non-reproducible op in the chain, while the binned empirical rate
    is division of identical operands. Per-bin weighted terms use
    ln() on identical doubles (the certified zipf/perplexity recipe);
    the final |bins|-row sum commutes up to 1e-12, absorbed by
    round 6.

    Scale shape: one scan computes features, label, logit, and bin in
    a single codegen'd projection; one |bins|-cardinality hash
    aggregate (≤ a few dozen unit-width logit bins); a 1-row reduce."""
    from ..operators.models import frozen_logit_expr, quality_feature_frame

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(
        docs, label_threshold=_QUALITY_LABEL_THRESHOLD
    )
    lab = feats.select(
        F.floor(frozen_logit_expr()).cast("bigint").alias("bin"),
        F.col("weak_label").alias("pos"),
    )
    g = lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.sum("pos").cast("double").alias("pb"),
    )
    p = (F.col("pb") + F.lit(1.0)) / (F.col("nb") + F.lit(2.0))
    e = g.select("nb", "pb", p.alias("p"))
    ll = -F.sum(
        F.col("pb") * F.log(F.col("p"))
        + (F.col("nb") - F.col("pb")) * F.log(F.lit(1.0) - F.col("p"))
    ) / F.sum("nb")
    br = F.sum(
        F.col("pb") * (F.lit(1.0) - F.col("p")) * (F.lit(1.0) - F.col("p"))
        + (F.col("nb") - F.col("pb")) * F.col("p") * F.col("p")
    ) / F.sum("nb")
    return e.agg(
        F.sum("nb").cast("bigint").alias("n_docs"),
        F.sum("pb").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(ll, 6).alias("logloss"),
        F.round(br, 6).alias("brier"),
    )


_KFOLD_K = 5


@register(
    "kfold_assignment_balanced",
    f"""
    WITH r AS (
      SELECT label,
        (row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1)
          % {_KFOLD_K} AS fold
      FROM embeddings
    )
    SELECT label, CAST(fold AS BIGINT) AS fold, count(*) AS cnt
    FROM r GROUP BY label, fold
    """,
)
def q_kfold_assignment_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment (k=5): within each label, examples
    ranked by vec_id take folds round-robin, so per-(label, fold)
    counts differ by at most one — the deterministic, seed-free split
    every cross-validation run needs to be REPRODUCIBLE across reruns,
    engines, and partitionings (a rand()-based splitter is none of
    those). Output is the label×fold balance matrix, which is also the
    stratification proof.

    Scale shape: one TWO-PASS global row numbering in (label, vec_id)
    order with per-label starts from a |labels|² triangular broadcast
    join — a label can be most of the corpus, so no per-label window —
    then a (label, fold) hash aggregate."""
    from ..operators.ranking import global_row_number

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    gn = global_row_number(emb, ["label", "vec_id"], rn_col="grn")
    tot = emb.groupBy("label").agg(F.count(F.lit(1)).alias("nl"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(F.broadcast(b), F.col("b.label") < F.col("a.label"), "left")
        .groupBy(F.col("a.label").alias("label"))
        .agg(F.coalesce(F.sum("b.nl"), F.lit(0)).alias("off"))
    )
    fold = (F.col("grn") - F.col("off") - 1) % _KFOLD_K
    return (
        gn.join(F.broadcast(off), "label")
        .select("label", fold.cast("bigint").alias("fold"))
        .groupBy("label", "fold")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


#: fixed-point scale for normalized embedding coordinates: 2^30. The
#: squared-sum denominator below is its square, 2^60.
_DIV_FIX = 1073741824.0
_DIV_FIX_SQ = 1152921504606846976.0


@register(
    "embedding_diversity_by_label",
    f"""
    WITH nrm AS (
      SELECT label,
        list_transform(embedding::DOUBLE[],
          x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[]))) AS u
      FROM embeddings
    ),
    f AS (
      SELECT label, d,
        CAST(floor(u[d] * {_DIV_FIX}) AS BIGINT) AS fd
      FROM nrm, unnest(generate_series(1, len(u))) AS t(d)
    ),
    s AS (
      SELECT label, d, CAST(sum(fd) AS DECIMAL(19,0)) AS sd
      FROM f GROUP BY label, d
    ),
    q AS (
      SELECT label, CAST(sum(sd * sd) AS DOUBLE) AS ss
      FROM s GROUP BY label
    ),
    n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
    SELECT n.label, n.n,
      round((ss / {_DIV_FIX_SQ} - CAST(n.n AS DOUBLE))
            / (CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1.0)), 6)
        AS avg_pairwise_cos
    FROM n JOIN q ON n.label = q.label
    """,
)
def q_embedding_diversity_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-class embedding diversity: the average pairwise cosine
    similarity among all n(n−1) ordered pairs of a label's normalized
    vectors — WITHOUT the pairwise join, via the norm-of-sum identity
    mean cos = (‖Σu‖² − n)/(n(n−1)). A high value means the class
    collapses to near-duplicates (SemDeDup's motivating signal); the
    identity turns an O(n²) similarity join into one linear scan.
    Normalized coordinates are fixed-pointed (floor(u·2³⁰), exact in
    both engines) so the per-(label, dim) sums are associative BIGINT
    — the pairwise average is then EXACT for the quantized vectors,
    deterministic under any partitioning, with quantization error
    ≤ 2⁻²⁹·d/ n(n−1)-pair bounded (immaterial at round 6 unless n is
    tiny).

    Scale shape: one scan, posexplode to (label, dim) — 64 rows per
    vector — into a hash aggregate of |labels|·64 cells, then a
    |labels|-row finalize. Never a pair join."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    w = v.select(
        "label",
        "v",
        F.sqrt(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda s, x: s + x * x
            )
        ).alias("nrm"),
    )
    f = w.select(
        "label", F.posexplode("v").alias("d0", "x"), "nrm"
    ).select(
        "label",
        (F.col("d0") + 1).alias("d"),
        F.floor((F.col("x") / F.col("nrm")) * F.lit(_DIV_FIX))
        .cast("bigint")
        .alias("fd"),
    )
    s = f.groupBy("label", "d").agg(
        F.sum("fd").cast("decimal(19,0)").alias("sd")
    )
    q = s.groupBy("label").agg(
        F.sum(F.col("sd") * F.col("sd")).cast("double").alias("ss")
    )
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    return n.join(q, "label").select(
        "label",
        "n",
        F.round(
            (F.col("ss") / F.lit(_DIV_FIX_SQ) - nd) / (nd * (nd - F.lit(1.0))),
            6,
        ).alias("avg_pairwise_cos"),
    )


#: activity interval length for coverage analysis: 10 minutes in µs.
_COVER_US = 600_000_000


@register(
    "active_coverage_time",
    f"""
    WITH pts AS (
      SELECT epoch_us(ts) AS t, 1 AS dd FROM events
      UNION ALL
      SELECT epoch_us(ts) + {_COVER_US}, -1 FROM events
    ),
    d AS (SELECT t, CAST(sum(dd) AS BIGINT) AS dd FROM pts GROUP BY t),
    w AS (
      SELECT t, sum(dd) OVER (ORDER BY t) AS c,
             lead(t) OVER (ORDER BY t) AS nt
      FROM d
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN c > 0 THEN nt - t ELSE 0 END) AS BIGINT)
          AS covered_us,
        CAST(min(t) AS BIGINT) AS lo, CAST(max(t) AS BIGINT) AS hi
      FROM w
    )
    SELECT covered_us, hi - lo AS span_us,
      round(CAST(covered_us AS DOUBLE) / CAST(hi - lo AS DOUBLE), 6)
        AS coverage_pct
    FROM s
    """,
)
def q_active_coverage_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION length: total wall-clock time with at least one
    active session (each event opens a 10-minute activity interval),
    as microseconds covered and as a fraction of the observed span —
    the uptime/coverage complement of `peak_concurrency` (that query
    asks "how high does concurrency go", this asks "how much of the
    timeline is covered at all"), and the denominator for utilization
    reports. Exact integer arithmetic end to end: merged ±1 deltas per
    distinct boundary, a running sum, and Σ(next_t − t) over positive-
    coverage segments.

    Scale shape: boundary deltas merge in one hash aggregate (the
    peak_concurrency discipline — merging BEFORE the sweep also kills
    phantom zero-length segments); the sweep is ONE fused two-pass
    global_running_sum_row_number on the (t) order (r13 — the separate
    running-sum and row-number ops each range-exchanged and eagerly
    pinned their own copy of the boundary table and were re-joined on
    t; identical values, half the sweep), with next-boundary lookup as
    an rn = rn+1 equi-join — one range exchange over DISTINCT
    boundaries, never a no-partition window."""
    from ..operators.ranking import global_running_sum_row_number

    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("t")
    )
    pts = ev.select("t", F.lit(1).alias("dd")).unionByName(
        ev.select((F.col("t") + _COVER_US).alias("t"), F.lit(-1).alias("dd"))
    )
    d = pts.groupBy("t").agg(F.sum("dd").alias("dd"))
    cur = global_running_sum_row_number(
        d, ["t"], "dd", sum_col="c", rn_col="rn"
    ).select("t", "c", "rn")
    nxt = cur.select(F.col("t").alias("nt"), (F.col("rn") - 1).alias("rn"))
    w = cur.join(nxt, "rn", "left")
    s = w.agg(
        F.sum(
            F.when(F.col("c") > 0, F.col("nt") - F.col("t")).otherwise(0)
        )
        .cast("bigint")
        .alias("covered_us"),
        F.min("t").alias("lo"),
        F.max("t").alias("hi"),
    )
    return s.select(
        "covered_us",
        (F.col("hi") - F.col("lo")).alias("span_us"),
        F.round(
            F.col("covered_us").cast("double")
            / (F.col("hi") - F.col("lo")).cast("double"),
            6,
        ).alias("coverage_pct"),
    )


_WSAMPLE_K = 200


@register(
    "weighted_sample_wor",
    f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
        -ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  ::BIGINT AS DOUBLE) + 0.5) / 281474976710656.0)
          / CAST(n_chars AS DOUBLE) AS ekey
      FROM documents
    )
    SELECT doc_id, source, n_chars, round(ekey, 9) AS ekey
    FROM keyed
    ORDER BY ekey, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def q_weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirtas): each
    doc draws exponential key E/w — E = −ln(u) from a 48-bit md5
    uniform, w = n_chars — and the k smallest keys are the sample, so
    inclusion probability is proportional to weight with no
    replacement bookkeeping and no sequential pass. Seed-free and
    layout-stable (the md5-threshold discipline): retries, speculative
    tasks, and both engines draw the SAME sample. u = (h48 + 0.5)/2^48
    keeps u strictly inside (0,1) — ln never sees 0 — and every float
    op (ln, divide) runs on identical operands, so keys are
    bit-identical cross-engine.

    Scale shape: one scan computing the key in codegen, then a global
    top-k by (ekey, doc_id) — TakeOrderedAndProject (per-partition
    heaps + driver merge of k·P rows), NEVER a global sort of the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    h48 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    )
    u = (h48.cast("double") + F.lit(0.5)) / F.lit(281474976710656.0)
    ekey = -F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id", "source", "n_chars", F.round(ekey, 9).alias("ekey")
        )
        .orderBy("ekey", "doc_id")
        .limit(_WSAMPLE_K)
    )


@register(
    "holt_linear_daily_volume",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, count(*) AS n_days,
        list_reduce(
          list_prepend([0.0, 0.0]::DOUBLE[],
            list_transform(list(cnt ORDER BY day),
                           c -> [CAST(c AS DOUBLE)])),
          (acc, x) -> [
            x[1] / 2 + (acc[1] + acc[2]) / 2,
            ((x[1] / 2 + (acc[1] + acc[2]) / 2) - acc[1]) / 2 + acc[2] / 2
          ]) AS st
      FROM d GROUP BY event_type
    )
    SELECT event_type, n_days,
      round(st[1], 6) AS level, round(st[2], 6) AS trend,
      round(st[1] + st[2], 6) AS forecast_next
    FROM ser
    """,
)
def q_holt_linear_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α = β = 1/2)
    over each event type's daily volume, with the one-step-ahead
    forecast level+trend — the trend-aware upgrade of the EWMA family
    that `seasonal_naive_backtest` benchmarks against. α = β = 1/2
    makes every update l' = x/2 + (l+t)/2, t' = (l'−l)/2 + t/2 a chain
    of exact halvings and IEEE adds evaluated in explicit day order,
    so the recurrence — inexpressible in any window frame — is
    bit-deterministic and cross-engine exact (the ewma_user_value
    discipline, lifted to a 2-component state; DuckDB folds the same
    steps via list_reduce with a DOUBLE[2] accumulator).

    Scale shape: one (type, day) hash aggregate over the corpus, then
    per-type folds over calendar-bounded arrays (|days| elements) —
    never per-event state."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    d = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    ser = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "cnt"))),
            lambda s: s["cnt"].cast("double"),
        ).alias("xs"),
    )

    def _step(acc, x):
        new_l = x / F.lit(2.0) + (acc["l"] + acc["t"]) / F.lit(2.0)
        new_l_again = x / F.lit(2.0) + (acc["l"] + acc["t"]) / F.lit(2.0)
        return F.struct(
            new_l.alias("l"),
            ((new_l_again - acc["l"]) / F.lit(2.0) + acc["t"] / F.lit(2.0)).alias(
                "t"
            ),
        )

    st = F.aggregate(
        F.col("xs"),
        F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("t")),
        _step,
    )
    out = ser.select("event_type", "n_days", st.alias("st"))
    return out.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.t"), 6).alias("trend"),
        F.round(F.col("st.l") + F.col("st.t"), 6).alias("forecast_next"),
    )


_KMEANS_K = 8
_KMEANS_PLANE_OFFSET = 100


def _kmeans_oracle() -> str:
    """DuckDB replica of the assignment step: identical centroid
    literals (blake2b-derived, zero driver state), identical left-fold
    dot products, argmin via QUALIFY row_number with the same
    (dist, k) tie-break."""
    from ..functions.vectors import plane_weight

    rows = []
    for k in range(_KMEANS_K):
        ws = [plane_weight(_KMEANS_PLANE_OFFSET + k, d) for d in range(64)]
        cc = 0.0
        for w in ws:
            cc += w * w
        arr = ", ".join(repr(w) for w in ws)
        rows.append(f"({k}, [{arr}]::DOUBLE[], {cc!r})")
    vals = ",\n      ".join(rows)
    return f"""
    WITH cents(k, c, cc) AS (VALUES
      {vals}
    ),
    dots AS (
      SELECT vec_id, k,
        cc - 2 * list_dot_product(embedding::DOUBLE[], c) AS score
      FROM embeddings CROSS JOIN cents
    )
    SELECT vec_id, CAST(k AS BIGINT) AS centroid, round(score, 6) AS score
    FROM dots
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score, k) = 1
    """


@register("kmeans_assign_step", _kmeans_oracle())
def q_kmeans_assign_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact k-means ASSIGNMENT step against k=8 frozen centroids
    (the deterministic blake2b plane vectors — zero driver state, so
    retries and both engines see identical literals): each vector goes
    to argmin‖x−c‖², computed as argmin(‖c‖² − 2·x·c) so the row's own
    norm never needs evaluating. This is the inner loop of Lloyd's
    algorithm as a pure Column program — the IVF index build
    (similarity.py) runs this same step iterated; here it is isolated,
    exact, and oracled, with ties broken (score, k) deterministically.

    Spark plans NO join and NO explode: all 8 scores evaluate in one
    codegen'd projection and argmin is array_min over an
    array<struct<score, k>> (lexicographic struct order = the
    tie-break); the oracle reaches the same assignment through a
    different mechanism (cross join + QUALIFY argmin window). Scale:
    one scan, zero exchanges — output is (vec_id, centroid, score)."""
    from ..functions.vectors import plane_dots, plane_weight

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    )
    ccs = []
    for k in range(_KMEANS_K):
        cc = 0.0
        for d in range(64):
            w = plane_weight(_KMEANS_PLANE_OFFSET + k, d)
            cc += w * w
        ccs.append(cc)
    pd_col = plane_dots("v", _KMEANS_K, n_dims=64, plane_offset=_KMEANS_PLANE_OFFSET)
    scored = emb.select("vec_id", pd_col.alias("pd"))
    pairs = F.array(
        *[
            F.struct(
                (F.lit(ccs[k]) - 2 * F.expr(f"element_at(pd, {k + 1})")).alias(
                    "score"
                ),
                F.lit(k).alias("k"),
            )
            for k in range(_KMEANS_K)
        ]
    )
    best = scored.select("vec_id", F.array_min(pairs).alias("b"))
    return best.select(
        "vec_id",
        F.col("b.k").cast("bigint").alias("centroid"),
        F.round(F.col("b.score"), 6).alias("score"),
    )


_RRF_NQ = 5
_RRF_DEPTH = 50
_RRF_C = 60.0
_RRF_OUT = 10


@register(
    "rrf_fusion_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_RRF_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v
          FROM embeddings),
    s1 AS (
      SELECT query_id, neighbor_id,
        list_dot_product(qv, v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
          AS cosine
      FROM q, c WHERE neighbor_id <> query_id
    ),
    r1 AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM s1) WHERE rank <= {_RRF_DEPTH}
    ),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scaled AS (
      SELECT vec_id, v,
        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS s
      FROM base
    ),
    codes AS (
      SELECT vec_id,
        list_transform(v, x -> CAST(floor(x / s + 0.5) AS INT)) AS qc
      FROM scaled
    ),
    normed AS (
      SELECT vec_id, qc,
        sqrt(CAST(list_sum(list_transform(qc, x -> CAST(x AS BIGINT) * x))
             AS DOUBLE)) AS qn
      FROM codes
    ),
    s2 AS (
      SELECT qs.vec_id AS query_id, cc.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(generate_series(1, len(qs.qc)),
          i -> CAST(qs.qc[i] AS BIGINT) * cc.qc[i])) AS DOUBLE)
          / (qs.qn * cc.qn) AS qcos
      FROM normed qs, normed cc
      WHERE qs.vec_id < {_RRF_NQ} AND cc.vec_id <> qs.vec_id
    ),
    r2 AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY qcos DESC, neighbor_id ASC) AS rank
        FROM s2) WHERE rank <= {_RRF_DEPTH}
    ),
    f AS (
      SELECT coalesce(r1.query_id, r2.query_id) AS query_id,
        coalesce(r1.neighbor_id, r2.neighbor_id) AS neighbor_id,
        coalesce(1.0 / ({_RRF_C} + r1.rank), 0.0)
          + coalesce(1.0 / ({_RRF_C} + r2.rank), 0.0) AS rrf
      FROM r1 FULL OUTER JOIN r2
        ON r1.query_id = r2.query_id AND r1.neighbor_id = r2.neighbor_id
    )
    SELECT query_id, neighbor_id, fused_rank, round(rrf, 9) AS rrf_score
    FROM (
      SELECT query_id, neighbor_id, rrf,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY rrf DESC, neighbor_id ASC) AS fused_rank
      FROM f) WHERE fused_rank <= {_RRF_OUT}
    """,
)
def q_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval signals — exact float
    cosine and int8-quantized cosine — per query:
    score = Σ 1/(60 + rank_i) over the lists that contain the
    candidate (depth 50 each), re-ranked to a fused top-10. RRF is THE
    standard hybrid-search combiner (dense + quantized here; dense +
    BM25 in a text stack) precisely because it needs only RANKS:
    integer ranks with deterministic tie-breaks make the fused scores
    one or two exact divisions — engine-reproducible where raw-score
    mixing would inherit every float-parity hazard of both scorers.

    Scale shape: both rankings broadcast the query set and scan the
    corpus once each (the ann_* plans); fusion itself joins two
    |queries|·depth frames — negligible. Windows partition by
    query_id over ≤ 2·depth candidate rows."""
    from ..operators.similarity import cosine_topk_bruteforce, quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _RRF_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    r1 = cosine_topk_bruteforce(emb, queries_df, k=_RRF_DEPTH).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank1")
    )
    r2 = quantized_topk(emb, queries_df, k=_RRF_DEPTH).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank2")
    )
    f = r1.join(r2, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("rank1")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("rank2")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    return (
        f.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= _RRF_OUT)
        .select(
            "query_id",
            "neighbor_id",
            "fused_rank",
            F.round("rrf", 9).alias("rrf_score"),
        )
    )


#: debounce threshold: one day in microseconds.
_DEBOUNCE_US = 86_400_000_000.0


@register(
    "debounce_rate_limit",
    f"""
    WITH folded AS (
      SELECT user_id, count(*) AS n_events,
        list_reduce(
          list_prepend([-1e18, 0.0]::DOUBLE[],
            list_transform(list(epoch_us(ts) ORDER BY epoch_us(ts), event_id),
                           t -> [CAST(t AS DOUBLE)])),
          (acc, x) -> [
            CASE WHEN x[1] - acc[1] >= {_DEBOUNCE_US}
                 THEN x[1] ELSE acc[1] END,
            acc[2] + CASE WHEN x[1] - acc[1] >= {_DEBOUNCE_US}
                          THEN 1.0 ELSE 0.0 END
          ]) AS st
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, CAST(st[2] AS BIGINT) AS n_kept
    FROM folded
    """,
)
def q_debounce_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True debounce / rate limiting: per user, keep an event only if
    ≥ 1 day has passed since the last KEPT event — the notification-
    throttling semantics. This is NOT gap sessionization (keep-first-
    per-session drops an event chain's later members even when they
    are far from the last kept one): the kept set depends on itself,
    a sequential recurrence no window frame expresses — so it folds,
    like the EWMA family, over the user's time-ordered events with a
    two-scalar accumulator [last_kept_ts, n_kept]. Timestamps ride as
    exact integer-valued doubles (µs < 2⁵³) and the fold is pure
    compares and +1s — bit-deterministic, engine-exact.

    Scale shape: one user-keyed hash aggregate building the sorted
    list, linear fold per user; state O(events per user) here, O(1)
    in the streaming formulation (the ewma_tracker pattern with a
    CASE instead of a halving)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    arr = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("us", "event_id"))),
            lambda s: s["us"].cast("double"),
        ).alias("ts_list"),
    )
    st = F.aggregate(
        F.col("ts_list"),
        F.struct(
            F.lit(-1e18).alias("last"), F.lit(0.0).alias("kept")
        ),
        lambda acc, x: F.when(
            x - acc["last"] >= F.lit(_DEBOUNCE_US),
            F.struct(x.alias("last"), (acc["kept"] + F.lit(1.0)).alias("kept")),
        ).otherwise(acc),
    )
    return arr.select(
        "user_id",
        "n_events",
        st["kept"].cast("bigint").alias("n_kept"),
    )


@register(
    "conformal_interval_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, cnt,
        lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
      FROM d
    ),
    res AS (
      SELECT event_type, day, abs(cnt - pred) AS r
      FROM lagged WHERE pred IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, r,
        row_number() OVER (PARTITION BY event_type ORDER BY r, day) AS rk,
        count(*) OVER (PARTITION BY event_type) AS n_cal
      FROM res
    )
    SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal,
      CAST(r AS BIGINT) AS qhat,
      round(CAST(rk AS DOUBLE) / n_cal, 6) AS empirical_coverage
    FROM ranked
    WHERE rk = least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal)
    """,
)
def q_conformal_interval_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the seasonal-naive
    daily-volume forecaster: the 90% interval half-width qhat is the
    ⌈0.9·(n+1)⌉-th smallest calibration residual |y_t − y_{t−7}| per
    event type — a finite-sample coverage GUARANTEE that needs no
    distributional assumption, the modern replacement for ±1.96σ
    error bars on forecast dashboards. Everything is exact integer
    order statistics (counts, lags, ranks); the only division is the
    reported empirical coverage.

    Scale shape: one (type, day) hash aggregate over the corpus; lag,
    rank, and selection run on calendar-bounded per-type frames."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    d = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    wlag = Window.partitionBy("event_type").orderBy("day")
    lagged = d.withColumn("pred", F.lag("cnt", 7).over(wlag))
    res = lagged.filter(F.col("pred").isNotNull()).select(
        "event_type", "day", F.abs(F.col("cnt") - F.col("pred")).alias("r")
    )
    wr = Window.partitionBy("event_type").orderBy("r", "day")
    wn = Window.partitionBy("event_type")
    ranked = res.select(
        "event_type",
        "r",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_cal"),
    )
    q_idx = F.least(
        F.ceil(F.lit(0.9) * (F.col("n_cal") + 1)).cast("bigint"),
        F.col("n_cal").cast("bigint"),
    )
    return ranked.filter(F.col("rk") == q_idx).select(
        "event_type",
        F.col("n_cal").cast("bigint").alias("n_cal"),
        F.col("r").cast("bigint").alias("qhat"),
        F.round(F.col("rk").cast("double") / F.col("n_cal"), 6).alias(
            "empirical_coverage"
        ),
    )


@register(
    "watermark_lateness_profile",
    """
    WITH w AS (
      SELECT epoch_us(ts) AS us,
        max(epoch_us(ts)) OVER (ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS wm
      FROM events
    ),
    l AS (SELECT (wm - us) // 3600000000 AS hours_late FROM w),
    n AS (SELECT count(*) AS total FROM l)
    SELECT CAST(hours_late AS BIGINT) AS hours_late, count(*) AS cnt,
      round(CAST(count(*) AS DOUBLE) / (SELECT total FROM n), 6) AS share
    FROM l GROUP BY hours_late
    """,
)
def q_watermark_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile: for each event, its lateness
    behind the high-watermark of everything that ARRIVED before it
    (arrival order = event_id), bucketed into hours — the histogram
    that DECIDES a streaming job's withWatermark delay: the smallest
    bucket boundary covering e.g. 99.9% of events is the delay that
    drops ≤ 0.1% as late. Exact integer microsecond arithmetic; the
    running max is order-dependent by definition, so the arrival
    order is pinned to the deterministic event_id sequence.

    Scale shape: the running max is the new TWO-PASS
    global_running_max (range partition on arrival order +
    per-partition running max + triangular prefix-max broadcast join —
    max is associative AND idempotent, so the combine is exact), then
    an |hours|-cardinality hash aggregate. No single-partition window
    anywhere."""
    from ..operators.ranking import global_running_max

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    w = global_running_max(ev, ["event_id"], "us", "wm")
    lat = w.select(
        F.expr("(wm - us) div 3600000000").alias("hours_late")
    )
    total = lat.agg(F.count(F.lit(1)).alias("total"))
    return (
        lat.groupBy("hours_late")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("hours_late").cast("bigint").alias("hours_late"),
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


@register(
    "theil_sen_daily_trend",
    """
    WITH d AS (
      SELECT event_type,
        CAST(CAST(date_trunc('day', ts) AS DATE)
             - DATE '2024-01-01' AS BIGINT) AS x,
        count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
        CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope,
        a.x AS ax, b.x AS bx
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x
    ),
    r AS (
      SELECT event_type, slope,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY slope, ax, bx) AS rk,
        count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM p
    )
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
      round(slope, 9) AS theil_slope
    FROM r WHERE rk = (n_pairs + 1) // 2
    """,
)
def q_theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume per type: the
    MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i) — up to ~29%
    corrupted days cannot move it, where the OLS slope
    (regr_value_vs_time) follows a single outlier. The O(n²) pair
    enumeration that normally disqualifies Theil–Sen is
    calendar-bounded here (n = days), the kendall_tau argument. The
    median is the exact lower-median order statistic with a
    deterministic (slope, day-pair) tie-break; each slope is one
    correctly-rounded division of exact integers, so selection is
    engine-identical.

    Scale shape: one (type, day) hash aggregate over the corpus, then
    |days|²-per-type joins and windows on tiny frames."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("bigint")
        .alias("x"),
    )
    d = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("y"))
    a, b = d.alias("a"), d.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
        F.col("a.x").alias("ax"),
        F.col("b.x").alias("bx"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "ax", "bx")
    wn = Window.partitionBy("event_type")
    r = p.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    return r.filter(
        F.col("rk") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round("slope", 9).alias("theil_slope"),
    )


_GINI_FP_SQL = (
    "(((nl * 1000000) {d} nt)"
    " * (((2 * pl * 1000000) {d} nl)"
    "    * (((nl - pl) * 1000000) {d} nl) {d} 1000000)"
    " {d} 1000000)"
    " + (((nr * 1000000) {d} nt)"
    " * (((2 * pr * 1000000) {d} nr)"
    "    * (((nr - pr) * 1000000) {d} nr) {d} 1000000)"
    " {d} 1000000)"
)


@register(
    "stump_cv_accuracy",
    f"""
    WITH d AS (
      SELECT doc_id % 5 AS fold, n_chars AS x,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    folds AS (SELECT unnest(generate_series(0, 4)) AS f),
    train AS (SELECT f, x, y FROM d JOIN folds ON d.fold <> folds.f),
    agg AS (
      SELECT f, x, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM train GROUP BY f, x
    ),
    cum AS (
      SELECT f, x,
        CAST(sum(n) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS nl,
        CAST(sum(pos) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS pl,
        CAST(sum(n) OVER (PARTITION BY f) AS BIGINT) AS nt,
        CAST(sum(pos) OVER (PARTITION BY f) AS BIGINT) AS pt
      FROM agg
    ),
    cand AS (
      SELECT f, x AS threshold, nl, pl, nt - nl AS nr, pt - pl AS pr, nt
      FROM cum WHERE nl < nt
    ),
    scored AS (
      SELECT f, threshold, nl, pl, nr, pr,
        {_GINI_FP_SQL.format(d="//")} AS gini_fp
      FROM cand
    ),
    best AS (
      SELECT f, threshold, nl, pl, nr, pr, gini_fp FROM scored
      QUALIFY row_number() OVER (PARTITION BY f
                                 ORDER BY gini_fp, threshold) = 1
    ),
    ev AS (
      SELECT d.fold AS f,
        CASE WHEN d.x <= b.threshold
             THEN CASE WHEN 2 * b.pl > b.nl THEN 1 ELSE 0 END
             ELSE CASE WHEN 2 * b.pr > b.nr THEN 1 ELSE 0 END
        END AS pred, d.y
      FROM d JOIN best b ON d.fold = b.f
    ),
    acc AS (
      SELECT f, count(*) AS test_n,
        CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
          AS n_correct
      FROM ev GROUP BY f
    )
    SELECT acc.f AS fold, b.threshold,
      CAST(b.gini_fp AS BIGINT) AS gini_fp, test_n, n_correct,
      round(CAST(n_correct AS DOUBLE) / test_n, 6) AS accuracy
    FROM acc JOIN best b ON acc.f = b.f
    """,
)
def q_stump_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated decision stump: for every held-out fold,
    train the exact Gini-optimal split (the decision_stump_split
    machinery, partitioned by fold) on the other four folds, predict
    each side's training-majority label, and score held-out accuracy —
    the full train/evaluate loop of distributed tree learning as ONE
    declarative plan, generalization measured honestly (the global
    stump's in-sample Gini cannot be compared across feature
    engineering choices; held-out accuracy can). Folds are
    deterministic (doc_id % 5); the staged ×10⁶ fixed-point Gini keeps
    every intermediate ≤ 2e18 at any corpus size, so the argmin split
    is bit-deterministic cross-engine.

    Scale shape: one (fold, x) hash aggregate over the 4×-replicated
    training view (explode of a 4-element fold list — narrow), windows
    over |folds|·|distinct x| rows (feature value domain,
    corpus-independent), a 5-row broadcast of the learned stumps back
    onto the corpus for scoring, and a 5-cell accuracy aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        (F.col("doc_id") % 5).alias("fold"),
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    train = d.select(
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.lit(4)),
                lambda v: v != F.col("fold"),
            )
        ).alias("f"),
        "x",
        "y",
    )
    agg = train.groupBy("f", "x").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wo = Window.partitionBy("f").orderBy("x")
    wt = Window.partitionBy("f")
    cum = agg.select(
        "f",
        "x",
        F.sum("n").over(wo).cast("long").alias("nl"),
        F.sum("pos").over(wo).cast("long").alias("pl"),
        F.sum("n").over(wt).cast("long").alias("nt"),
        F.sum("pos").over(wt).cast("long").alias("pt"),
    )
    cand = cum.filter(F.col("nl") < F.col("nt")).select(
        "f",
        F.col("x").alias("threshold"),
        "nl",
        "pl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        (F.col("pt") - F.col("pl")).alias("pr"),
        "nt",
    )
    scored = cand.select(
        "f",
        "threshold",
        "nl",
        "pl",
        "nr",
        "pr",
        F.expr(_GINI_FP_SQL.format(d="div")).cast("long").alias("gini_fp"),
    )
    best = scored.groupBy("f").agg(
        F.min(
            F.struct("gini_fp", "threshold", "nl", "pl", "nr", "pr")
        ).alias("b")
    ).select("f", "b.*")
    pred = F.when(
        F.col("x") <= F.col("threshold"),
        F.when(2 * F.col("pl") > F.col("nl"), 1).otherwise(0),
    ).otherwise(F.when(2 * F.col("pr") > F.col("nr"), 1).otherwise(0))
    ev = d.join(F.broadcast(best), d["fold"] == best["f"]).select(
        "f", "threshold", "gini_fp", pred.alias("pred"), "y"
    )
    return (
        ev.groupBy("f", "threshold", "gini_fp")
        .agg(
            F.count(F.lit(1)).alias("test_n"),
            F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            F.col("f").alias("fold"),
            "threshold",
            "gini_fp",
            "test_n",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("test_n"), 6
            ).alias("accuracy"),
        )
    )


@register(
    "nearest_centroid_accuracy",
    f"""
    WITH f AS (
      SELECT label, vec_id, d,
        CAST(floor(embedding[d] * {_DIV_FIX}) AS BIGINT) AS fd
      FROM embeddings,
        unnest(generate_series(1, len(embedding))) AS t(d)
    ),
    s AS (
      SELECT label, d, CAST(sum(fd) AS DECIMAL(19,0)) AS sd
      FROM f GROUP BY label, d
    ),
    cent AS (
      SELECT label,
        list_transform(list(sd ORDER BY d), v -> CAST(v AS DOUBLE)) AS c,
        sqrt(CAST(sum(sd * sd) AS DOUBLE)) AS cn
      FROM s GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label AS true_label, cent.label AS cand,
        list_dot_product(e.embedding::DOUBLE[], cent.c) / cent.cn AS score
      FROM embeddings e CROSS JOIN cent
    ),
    pred AS (
      SELECT vec_id, true_label, cand AS pred_label FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY score DESC, cand ASC) = 1
    )
    SELECT true_label AS label, count(*) AS n,
      CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
           AS BIGINT) AS n_correct,
      round(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def q_nearest_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification accuracy per label —
    the cheapest embedding-space quality probe: if vectors can't even
    be claimed by their own class centroid, the embedding (or the
    labels) are broken. Centroids come from the fixed-point BIGINT
    coordinate sums (the embedding_diversity discipline — associative,
    partition-independent), cosine ranking uses dot(x, S)/‖S‖ (the
    row's own norm cancels across candidates), and argmax ties break
    on label. Scoring raw embedding doubles against exact integer
    centroid sums keeps every float op on identical cross-engine
    operands.

    Scale shape: one posexplode scan into a |labels|·64-cell aggregate
    (centroid build), a |labels|-row broadcast back onto the corpus
    (scores in codegen), and a per-vector argmin over |labels|
    candidates — rows never pair with rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    fxp = v.select(
        "label", F.posexplode("v").alias("d0", "x")
    ).select(
        "label",
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("x") * F.lit(_DIV_FIX)).cast("bigint").alias("fd"),
    )
    s = fxp.groupBy("label", "d").agg(
        F.sum("fd").cast("decimal(19,0)").alias("sd")
    )
    cent = s.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "sd"))),
            lambda st: st["sd"].cast("double"),
        ).alias("c"),
        F.sqrt(F.sum(F.col("sd") * F.col("sd")).cast("double")).alias("cn"),
    ).select(F.col("label").alias("cand"), "c", "cn")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "cand",
        (dot / F.col("cn")).alias("score"),
    )
    wp = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("vec_id", "true_label", F.col("cand").alias("pred_label"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(
                    0
                )
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


@register(
    "bm25_topk",
    """
    WITH tok AS (
      SELECT doc_id, w FROM documents,
        unnest(string_split(text, ' ')) AS t(w) WHERE w <> ''
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, w
    ),
    dlen AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len) AS DOUBLE) / count(*) AS avg
      FROM dlen
    ),
    top3 AS (
      SELECT w FROM (
        SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY w
        ORDER BY cf DESC, w LIMIT 3)
    ),
    dfq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df
      FROM tf JOIN top3 USING (w) GROUP BY w
    ),
    terms AS (
      SELECT w, ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
      FROM dfq CROSS JOIN stats
    ),
    sc AS (
      SELECT tf.doc_id,
        sum(idf * (tf * 2.2)
            / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg))) AS s
      FROM tf JOIN terms USING (w) JOIN dlen USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(s, 6) AS bm25
    FROM sc ORDER BY s DESC, doc_id LIMIT 20
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 retrieval (k1 = 1.2, b = 0.75, Lucene's smoothed
    idf) for the corpus's three most frequent terms — the lexical half
    of every hybrid search stack (rrf_fusion_topk fuses the dense
    half). Query terms are selected IN-PLAN (top collection frequency,
    tie word asc) so the query is deterministic and SF-invariant
    without data-dependent literals. idf's ln() runs on identical
    operands (certified recipe); the ≤ 3 per-doc term contributions
    commute within round-6 (the zipf precedent).

    Scale shape: one token explode into (doc, word) and (doc) hash
    aggregates — the corpus exchanges; term selection is a global
    top-3 (TakeOrdered); scoring joins the 3-row term table broadcast
    against the posting rows of just those terms; final answer is a
    global top-20 (TakeOrdered), never a corpus sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dlen = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    stats = dlen.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("len").cast("double") / F.count(F.lit(1))).alias("avg"),
    )
    top3 = (
        tf.groupBy("w")
        .agg(F.sum("tf").cast("long").alias("cf"))
        .orderBy(F.col("cf").desc(), F.col("w"))
        .limit(3)
        .select("w")
    )
    dfq = (
        tf.join(F.broadcast(top3), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    terms = dfq.crossJoin(F.broadcast(stats)).select(
        "w",
        F.log(
            F.lit(1.0)
            + (F.col("n").cast("double") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avg",
    )
    term_score = (
        F.col("idf")
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (
                F.lit(1.0)
                - F.lit(0.75)
                + F.lit(0.75) * F.col("len") / F.col("avg")
            )
        )
    )
    sc = (
        tf.join(F.broadcast(terms), "w")
        .join(dlen, "doc_id")
        .select("doc_id", term_score.alias("ts"))
        .groupBy("doc_id")
        .agg(F.sum("ts").alias("s"))
    )
    return (
        sc.orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(20)
        .select("doc_id", F.round("s", 6).alias("bm25"))
    )


@register(
    "time_decay_attribution",
    """
    WITH conv AS (
      SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type AS channel,
             epoch_us(ts) AS tus
      FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT t.channel,
        (c.cus - t.tus) // 86400000000 AS days_before
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id
       AND t.tus < c.cus
       AND t.tus >= c.cus - 2592000000000
    )
    SELECT channel, count(*) AS n_touches,
      CAST(sum(CAST(2 AS BIGINT)
               ** (20 - least(days_before, 20))) AS BIGINT) AS credits_fp,
      round(CAST(sum(CAST(2 AS BIGINT)
                     ** (20 - least(days_before, 20))) AS DOUBLE)
            / 1048576.0, 6) AS credit
    FROM pairs GROUP BY channel
    """,
)
def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every non-purchase touch in
    the 30 days before a user's purchase earns credit 2^-min(days, 20)
    — halving per day, the standard decay curve — aggregated per
    channel. The dyadic weights are stored as INTEGER credits scaled
    by 2^20 (credit = 1 << (20 − days)), so the channel totals are
    associative BIGINT sums: exact, partition-order-independent, and
    engine-identical with NO float in the pipeline until the final
    display division (exact for totals < 2^33 credits ≈ 8.6e9 touch
    units — document-raise to DECIMAL beyond). Complements
    `last_touch_attribution` (winner-take-all) with the
    fractional-credit model.

    Scale shape: conversions and touches join user-keyed with an
    event-time band predicate (the range_join_error_bursts class) —
    per-user frames bounded by activity retention; then a
    |channels|-cell hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("cus")
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("tus"),
    )
    pairs = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tus") < F.col("cus"))
        & (F.col("tus") >= F.col("cus") - F.lit(2_592_000_000_000)),
    ).select(
        "channel",
        F.expr("(cus - tus) div 86400000000").alias("days_before"),
    )
    credit_fp = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "CAST(20 - least(days_before, 20) AS INT))"
    )
    return pairs.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(credit_fp).cast("bigint").alias("credits_fp"),
        F.round(
            F.sum(credit_fp).cast("double") / F.lit(1048576.0), 6
        ).alias("credit"),
    )


_NEG_K = 2


@register(
    "negative_sampling_copurchase",
    f"""
    WITH pos AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS pos_part
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part),
    cand AS (
      SELECT user_id, pos_part, j,
        ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':'
                               || CAST(pos_part AS VARCHAR) || ':'
                               || CAST(j AS VARCHAR)), 1, 12))::BIGINT
          % n_parts AS neg_part
      FROM pos CROSS JOIN np, range(0, {_NEG_K}) AS t(j)
    )
    SELECT c.user_id, c.pos_part, CAST(c.j AS BIGINT) AS j, c.neg_part
    FROM cand c
    WHERE NOT EXISTS (
      SELECT 1 FROM pos p
      WHERE p.user_id = c.user_id AND p.pos_part = c.neg_part
    )
    """,
)
def q_negative_sampling_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender training: every
    (user, purchased part) positive draws k=2 candidate negatives by
    md5-hashing (user, part, j) into the part-key space, then an
    ANTI-join against the user's true purchase set drops accidental
    positives — the standard contrastive-pairs generator, with the
    md5-threshold discipline instead of rand(): retries, speculative
    tasks, both engines, and tomorrow's rerun all draw the SAME
    negatives, so training data is reproducible and the eval split
    can't silently shift. (Collision-dropped candidates are dropped,
    not resampled — at |parts| ≫ per-user purchases the loss is the
    purchase density, and determinism beats exact-k.)

    Scale shape: one distinct (user, part) aggregate, a narrow k-way
    candidate expansion in codegen, and a user-keyed LEFT ANTI join
    back against the positives — all keyed shuffles, no row pairing
    beyond the k factor."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pos = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("pos_part"),
        )
        .distinct()
    )
    np_ = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    cand = (
        pos.crossJoin(F.broadcast(np_))
        .select(
            "user_id",
            "pos_part",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("j"),
            "n_parts",
        )
        .select(
            "user_id",
            "pos_part",
            F.col("j").cast("long").alias("j"),
            (
                F.conv(
                    F.concat_ws(
                        "",
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("user_id").cast("string"),
                                    F.col("pos_part").cast("string"),
                                    F.col("j").cast("string"),
                                )
                            ),
                            1,
                            12,
                        ),
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_parts")
            ).alias("neg_part"),
        )
    )
    return cand.join(
        pos.select(
            F.col("user_id").alias("p_user"), F.col("pos_part").alias("p_part")
        ),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("neg_part") == F.col("p_part")),
        "left_anti",
    ).select("user_id", "pos_part", "j", "neg_part")


@register(
    "threshold_breach_episodes",
    """
    WITH d AS (
      SELECT event_type,
        CAST(CAST(date_trunc('day', ts) AS DATE)
             - DATE '2024-01-01' AS BIGINT) AS day_num,
        count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d GROUP BY event_type
    ),
    breach AS (
      SELECT d.event_type, day_num
      FROM d JOIN tot USING (event_type)
      WHERE cnt * n_days > total
    ),
    isl AS (
      SELECT event_type, day_num,
        day_num - row_number() OVER (PARTITION BY event_type
                                     ORDER BY day_num) AS grp
      FROM breach
    )
    SELECT event_type, CAST(min(day_num) AS BIGINT) AS start_day,
      CAST(max(day_num) AS BIGINT) AS end_day,
      count(*) AS n_days
    FROM isl GROUP BY event_type, grp
    """,
)
def q_threshold_breach_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive days where a type's volume runs
    above its own average collapse into breach EPISODES (start, end,
    length) — the alerting shape behind "elevated error rate for 4
    straight days", and the canonical islands construction
    (day − row_number = island key). The threshold compare is
    cross-multiplied (cnt·n_days > total) so no division touches the
    classification — integer-exact on both engines.

    Scale shape: one (type, day) hash aggregate over the corpus; the
    islands window and episode rollup run on calendar-bounded
    per-type frames."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("day_num"),
    )
    d = ev.groupBy("event_type", "day_num").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = d.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    breach = (
        d.join(F.broadcast(tot), "event_type")
        .filter(F.col("cnt") * F.col("n_days") > F.col("total"))
        .select("event_type", "day_num")
    )
    w = Window.partitionBy("event_type").orderBy("day_num")
    isl = breach.withColumn(
        "grp", F.col("day_num") - F.row_number().over(w)
    )
    return isl.groupBy("event_type", "grp").agg(
        F.min("day_num").cast("bigint").alias("start_day"),
        F.max("day_num").cast("bigint").alias("end_day"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("grp")


@register(
    "diff_in_diff_value",
    f"""
    WITH cells AS (
      SELECT
        CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
             THEN 1 ELSE 0 END AS treated,
        CASE WHEN ts >= TIMESTAMP '{_CUPED_BOUNDARY}' THEN 1 ELSE 0 END
          AS post,
        CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR)
             AS DOUBLE) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    m AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 1 THEN s / n END) AS t_post,
        max(CASE WHEN treated = 1 AND post = 0 THEN s / n END) AS t_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN s / n END) AS c_post,
        max(CASE WHEN treated = 0 AND post = 0 THEN s / n END) AS c_pre,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM cells
    )
    SELECT n_total,
      round(t_pre, 6) AS t_pre, round(t_post, 6) AS t_post,
      round(c_pre, 6) AS c_pre, round(c_post, 6) AS c_post,
      round((t_post - t_pre) - (c_post - c_pre), 6) AS did
    FROM m
    """,
)
def q_diff_in_diff_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 (treated × post-period) cell
    means of `value` and the DiD estimate (ΔT − ΔC) — the workhorse
    causal readout when assignment isn't randomized and a parallel
    pre-trend is the identification assumption; shares its md5
    assignment and period boundary with `ab_test_cuped` so the two
    readouts are directly comparable on the same cohort. Cell sums
    accumulate in DECIMAL (associative — partition-order-proof); the
    four means and the final subtraction are one identical double
    tree.

    Scale shape: ONE scan into a 4-cell hash aggregate with map-side
    partials, then scalar arithmetic. The cheapest causal query
    there is."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    cells = ev.groupBy(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 1
        )
        .otherwise(0)
        .alias("treated"),
        F.when(F.col("ts") >= F.lit(_CUPED_BOUNDARY).cast("timestamp"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
        .alias("s"),
    )
    mean = lambda t, p: F.max(  # noqa: E731
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("s") / F.col("n"),
        )
    )
    m = cells.agg(
        mean(1, 1).alias("t_post"),
        mean(1, 0).alias("t_pre"),
        mean(0, 1).alias("c_post"),
        mean(0, 0).alias("c_pre"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return m.select(
        "n_total",
        F.round("t_pre", 6).alias("t_pre"),
        F.round("t_post", 6).alias("t_post"),
        F.round("c_pre", 6).alias("c_pre"),
        F.round("c_post", 6).alias("c_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did"),
    )


@register(
    "relational_division_users",
    """
    WITH types AS (SELECT count(DISTINCT event_type) AS nt FROM events),
    u AS (
      SELECT user_id, count(DISTINCT event_type) AS k FROM events
      GROUP BY user_id
    )
    SELECT user_id, CAST(k AS BIGINT) AS n_types
    FROM u CROSS JOIN types WHERE k = nt
    """,
)
def q_relational_division_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — "users who performed EVERY event type" —
    the FOR ALL quantifier SQL famously lacks, spelled as the standard
    count-matching reduction (per-user distinct-type count equals the
    global distinct-type count). The doubled NOT EXISTS spelling is
    semantically identical but plans two correlated anti-joins; the
    count form is one hash aggregate plus a 1-row broadcast.

    Scale shape: one user-keyed distinct aggregate over the corpus;
    the divisor cardinality is a broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    types = ev.agg(F.countDistinct("event_type").alias("nt"))
    u = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("k")
    )
    return (
        u.crossJoin(F.broadcast(types))
        .filter(F.col("k") == F.col("nt"))
        .select("user_id", F.col("k").cast("bigint").alias("n_types"))
    )


@register(
    "cart_abandonment_rate",
    """
    WITH clicks AS (
      SELECT user_id, event_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'
    ),
    judged AS (
      SELECT c.user_id, c.event_id,
        CASE WHEN EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
            AND epoch_us(p.ts) > c.cus
            AND epoch_us(p.ts) <= c.cus + 86400000000
        ) THEN 0 ELSE 1 END AS abandoned
      FROM clicks c
    )
    SELECT count(*) AS n_clicks,
      CAST(sum(abandoned) AS BIGINT) AS n_abandoned,
      round(CAST(sum(abandoned) AS DOUBLE) / count(*), 6)
        AS abandonment_rate
    FROM judged
    """,
)
def q_cart_abandonment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sequential pattern — clicks NOT followed by a purchase
    within 24 hours — the abandonment metric that is the complement of
    every funnel query here (funnels count completions; products
    optimize the failures). The NOT-followed-by quantifier compiles to
    a time-banded LEFT ANTI join on user (the watermarked
    stream-stream left-join's batch shape), never a correlated
    per-row subquery.

    Scale shape: clicks anti-join purchases user-keyed with an
    event-time band — both sides one scan, one keyed shuffle; the rate
    is a 1-row reduce. Exact integer microsecond arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.unix_micros("ts").alias("cus")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("pus")
    )
    abandoned = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pus") > F.col("cus"))
        & (F.col("pus") <= F.col("cus") + F.lit(86_400_000_000)),
        "left_anti",
    )
    n_ab = abandoned.agg(F.count(F.lit(1)).alias("n_abandoned"))
    n_all = clicks.agg(F.count(F.lit(1)).alias("n_clicks"))
    return n_all.crossJoin(n_ab).select(
        "n_clicks",
        "n_abandoned",
        F.round(
            F.col("n_abandoned").cast("double") / F.col("n_clicks"), 6
        ).alias("abandonment_rate"),
    )


def _hll_sliding_oracle() -> str:
    from ..operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        _HLL_RHO_MAX,
        hll_register_exprs,
    )

    e = hll_register_exprs("CAST(user_id AS VARCHAR)")
    m = HLL_M
    numer = (
        f"CAST({HLL_ALPHA!r} AS DOUBLE) * {m} * {m} * "
        f"CAST((1::BIGINT << {_HLL_RHO_MAX}) AS DOUBLE)"
    )
    s_all = f"(s_int + ({m} - n_regs) * (1::BIGINT << {_HLL_RHO_MAX}))"
    raw = f"({numer}) / CAST({s_all} AS DOUBLE)"
    v = f"({m} - n_regs)"
    est = (
        f"CASE WHEN {raw} <= 2.5 * {m} AND {v} > 0 "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / {v}) ELSE {raw} END"
    )
    return f"""
    WITH regs AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        {e["bucket_hex"]} AS bucket_hex, MAX({e["rho"]}) AS rho
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM regs),
    spread AS (
      SELECT regs.day + CAST(o AS INTEGER) AS wd, bucket_hex, rho
      FROM regs, range(0, 7) AS t(o)
    ),
    win AS (
      SELECT wd, bucket_hex, MAX(rho) AS rho
      FROM spread JOIN days ON spread.wd = days.day
      GROUP BY wd, bucket_hex
    ),
    summary AS (
      SELECT wd AS day,
        SUM((1::BIGINT << ({_HLL_RHO_MAX} - rho)))::BIGINT AS s_int,
        COUNT(*) AS n_regs
      FROM win GROUP BY 1
    )
    SELECT day, round({est}, 4) AS est_distinct,
      CAST(n_regs AS BIGINT) AS n_registers
    FROM summary
    """


@register("hll_sliding_7day_users", _hll_sliding_oracle())
def q_hll_sliding_7day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGED daily HLL
    sketches — the sketch answer to the question `dau_wau_stickiness`
    answers exactly: each day keeps only its 256-register table, and
    every trailing window is the per-bucket MAX over 7 days of
    registers (sketch union), never a rescan of raw ids. At 100 TB
    this is THE sliding-distinct pattern: state per day is 256 rows
    regardless of traffic, windows of any length merge associatively,
    and backfills recompute from stored sketches. The oracle replays
    register construction, the 7-day merge, and the exact-integer
    harmonic estimate; accuracy vs the exact trailing distinct is
    pytest-gated separately (m=256 → ~6.5% standard error).

    Scale shape: one (day, bucket) hash aggregate over the corpus
    (map-side max partials), a 7× register fan-out (≤ 7·256 rows per
    day), a (window-day, bucket) max aggregate, and a |days|-row
    estimate projection."""
    from ..operators.sketches import _hll_summary_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    regs = hll_registers(ev, ["day"], "user_id")
    days = regs.select("day").distinct()
    spread = regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
        "bucket_hex",
        "rho",
    ).select(
        F.date_add("day", F.col("o").cast("int")).alias("wd"),
        "bucket_hex",
        "rho",
    )
    win = (
        spread.join(
            F.broadcast(days), spread["wd"] == days["day"], "left_semi"
        )
        .groupBy("wd", "bucket_hex")
        .agg(F.max("rho").alias("rho"))
    )
    return _hll_summary_estimate(
        win.withColumnRenamed("wd", "day"), "day"
    )


@register(
    "woe_encoding_bins",
    """
    WITH b AS (
      SELECT ntile(5) OVER (ORDER BY n_chars, doc_id) AS bin,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    g AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(y) AS BIGINT) AS pos
      FROM b GROUP BY bin
    ),
    t AS (
      SELECT CAST(sum(pos) AS BIGINT) AS tp,
        CAST(sum(n - pos) AS BIGINT) AS tn
      FROM g
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, pos,
      round(ln((CAST(pos AS DOUBLE) + 0.5) / (tp + 0.5)
               / (((n - pos) + 0.5) / (tn + 0.5))), 6) AS woe,
      round(((CAST(pos AS DOUBLE) + 0.5) / (tp + 0.5)
             - ((n - pos) + 0.5) / (tn + 0.5))
            * ln((CAST(pos AS DOUBLE) + 0.5) / (tp + 0.5)
                 / (((n - pos) + 0.5) / (tn + 0.5))), 6) AS iv_term
    FROM g CROSS JOIN t
    """,
)
def q_woe_encoding_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding of doc length against the
    is-English label over exact quintile bins, with each bin's
    Information-Value term — the credit-scoring-lineage feature
    transform (monotone, missing-friendly, directly interpretable as
    log-odds shift) that feeds logistic models; Σiv_term is the
    classic feature-strength screen (IV > 0.3 ≈ strong). Counts are
    exact integers, the ±0.5 Laplace terms keep empty cells finite,
    and woe/iv are one identical ln-bearing double tree (the
    logloss/zipf recipe).

    Scale shape: binning is the TWO-PASS exact global_ntile (range
    exchange + offsets — never a single-partition ntile window at
    scale; the oracle's plain ntile is the SQL spelling), then a
    5-cell aggregate and a broadcast totals row."""
    from ..operators.ranking import global_ntile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    b = global_ntile(docs, ["n_chars", "doc_id"], 5, out_col="bin")
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    t = g.agg(
        F.sum("pos").cast("bigint").alias("tp"),
        F.sum(F.col("n") - F.col("pos")).cast("bigint").alias("tn"),
    )
    pp = (F.col("pos").cast("double") + F.lit(0.5)) / (F.col("tp") + F.lit(0.5))
    pn = ((F.col("n") - F.col("pos")) + F.lit(0.5)) / (
        F.col("tn") + F.lit(0.5)
    )
    woe = F.log(pp / pn)
    return g.crossJoin(F.broadcast(t)).select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        "pos",
        F.round(woe, 6).alias("woe"),
        F.round((pp - pn) * woe, 6).alias("iv_term"),
    )


@register(
    "paired_sign_test_improvement",
    """
    WITH span AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(max(epoch_us(ts)) AS BIGINT) AS hi
      FROM events
    ),
    u AS (
      SELECT user_id,
        sum(CASE WHEN epoch_us(ts) < lo + 604800000000
                 THEN CAST(value AS DECIMAL(18,6)) END) AS s1,
        count(CASE WHEN epoch_us(ts) < lo + 604800000000 THEN 1 END) AS n1,
        sum(CASE WHEN epoch_us(ts) >= hi - 604800000000
                 THEN CAST(value AS DECIMAL(18,6)) END) AS s2,
        count(CASE WHEN epoch_us(ts) >= hi - 604800000000 THEN 1 END) AS n2
      FROM events CROSS JOIN span
      WHERE value IS NOT NULL
      GROUP BY user_id
    ),
    paired AS (
      SELECT user_id,
        CASE WHEN s2 * n1 > s1 * n2 THEN 1 ELSE 0 END AS improved,
        CASE WHEN s2 * n1 < s1 * n2 THEN 1 ELSE 0 END AS worsened
      FROM u WHERE n1 > 0 AND n2 > 0
    )
    SELECT count(*) AS n_paired,
      CAST(sum(improved) AS BIGINT) AS n_improved,
      CAST(sum(worsened) AS BIGINT) AS n_worsened,
      CAST(count(*) - sum(improved) - sum(worsened) AS BIGINT) AS n_tied,
      round((CAST(sum(improved) AS DOUBLE) - CAST(sum(worsened) AS DOUBLE))
            / sqrt(CAST(sum(improved) AS DOUBLE)
                   + CAST(sum(worsened) AS DOUBLE)), 6) AS sign_z
    FROM paired
    """,
)
def q_paired_sign_test_improvement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: did per-user mean `value` improve between the
    FIRST week and the LAST week of the observation span? Each user
    with activity in both windows contributes one sign; the test
    statistic (I − W)/√(I + W) is the tie-discarding binomial normal
    approximation — the reference's domain question ("did the
    customer's balance score improve?") answered distribution-free at
    population level. The improved/worsened classification never
    divides: mean comparison s2/n2 > s1/n1 is cross-multiplied to
    s2·n1 > s1·n2 over DECIMAL-exact sums — integer-exact, so the
    paired signs are bit-reproducible on both engines.

    Scale shape: a 1-row span scan broadcast, ONE user-keyed
    conditional aggregate over the corpus, and a 1-row reduce."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    wk = F.lit(604_800_000_000)
    us = F.unix_micros("ts")
    dec = F.col("value").cast("decimal(18,6)")
    u = ev.crossJoin(F.broadcast(span)).groupBy("user_id").agg(
        F.sum(F.when(us < F.col("lo") + wk, dec)).alias("s1"),
        F.count(F.when(us < F.col("lo") + wk, 1)).alias("n1"),
        F.sum(F.when(us >= F.col("hi") - wk, dec)).alias("s2"),
        F.count(F.when(us >= F.col("hi") - wk, 1)).alias("n2"),
    )
    paired = u.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.when(F.col("s2") * F.col("n1") > F.col("s1") * F.col("n2"), 1)
        .otherwise(0)
        .alias("improved"),
        F.when(F.col("s2") * F.col("n1") < F.col("s1") * F.col("n2"), 1)
        .otherwise(0)
        .alias("worsened"),
    )
    imp = F.sum("improved").cast("bigint")
    wor = F.sum("worsened").cast("bigint")
    return paired.agg(
        F.count(F.lit(1)).alias("n_paired"),
        imp.alias("n_improved"),
        wor.alias("n_worsened"),
        (F.count(F.lit(1)) - F.sum("improved") - F.sum("worsened"))
        .cast("bigint")
        .alias("n_tied"),
        F.round(
            (imp.cast("double") - wor.cast("double"))
            / F.sqrt(imp.cast("double") + wor.cast("double")),
            6,
        ).alias("sign_z"),
    )


@register(
    "risk_alert_bursts",
    """
    WITH hi AS (
      SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE value > 50.0
    ),
    c AS (
      SELECT user_id, us,
        count(*) OVER (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 3600000000 PRECEDING
                       AND CURRENT ROW) AS n_hour
      FROM hi
    )
    SELECT user_id, count(*) AS n_alerts,
      CAST(min(us) AS BIGINT) AS first_alert_us,
      CAST(max(us) AS BIGINT) AS last_alert_us
    FROM c WHERE n_hour >= 3
    GROUP BY user_id
    """,
)
def q_risk_alert_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst alerting on the reference's own domain signal: a
    high-risk reading (value > 50, the threshold is a deployment
    parameter — set here so the synthetic corpus actually exercises
    the rule: 4 alerting users at sf0.01, 18 at sf0.1, vs ZERO at the
    r7 value of 200, which made the driver's 0-rows-vs-0-rows hash
    match vacuous) ALERTS when it is the third or later within a
    trailing hour for that user — the page-the-nurse rule that a
    single spike must not trigger but a cluster must. The trailing
    count is an event-time RANGE frame (two-pointer O(n) per user, the
    rolling_hour_avg machinery) over only the pre-filtered high
    readings; integer microsecond arithmetic throughout. A planted
    3-in-an-hour burst (plus a 2-in-an-hour control that must stay
    silent) is pinned in tests/test_fidelity_semantics.py.

    Scale shape: the value filter prunes at the scan, then ONE
    user-keyed exchange + sort shared by the frame and the final
    per-user rollup. The streaming twin is a 1-hour sliding-window
    count — the same predicate as a watermarked windowed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 50.0).select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    c = hi.withColumn("n_hour", F.count(F.lit(1)).over(w))
    return (
        c.filter(F.col("n_hour") >= 3)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.min("us").cast("bigint").alias("first_alert_us"),
            F.max("us").cast("bigint").alias("last_alert_us"),
        )
    )


@register(
    "repeat_customer_revenue_share",
    """
    WITH oc AS (
      SELECT o_custkey, count(*) AS n_orders,
        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS repeat_customers,
        CAST(count(*) AS BIGINT) AS total_customers,
        CAST(CAST(sum(CASE WHEN n_orders >= 2 THEN rev END) AS VARCHAR)
             AS DOUBLE) AS repeat_rev,
        CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_rev
      FROM oc
    )
    SELECT repeat_customers, total_customers,
      round(repeat_rev, 2) AS repeat_revenue,
      round(total_rev, 2) AS total_revenue,
      round(repeat_rev / total_rev, 6) AS repeat_share
    FROM s
    """,
)
def q_repeat_customer_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-vs-one-time customer revenue mix — the retention-economics
    headline number (mature businesses book most revenue from repeat
    buyers; a falling share is the early churn alarm). One customer
    aggregate classifies by order count; DECIMAL revenue sums surface
    as doubles through the string hop (the q1/q5 exactness recipe).

    Scale shape: one (custkey) hash aggregate over orders with
    map-side partials, then a 1-row classification reduce."""
    orders = load_table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    rep = F.col("n_orders") >= 2
    s = oc.agg(
        F.sum(F.when(rep, 1).otherwise(0)).cast("bigint").alias(
            "repeat_customers"
        ),
        F.count(F.lit(1)).cast("bigint").alias("total_customers"),
        F.sum(F.when(rep, F.col("rev")))
        .cast("string")
        .cast("double")
        .alias("repeat_rev"),
        F.sum("rev").cast("string").cast("double").alias("total_rev"),
    )
    return s.select(
        "repeat_customers",
        "total_customers",
        F.round("repeat_rev", 2).alias("repeat_revenue"),
        F.round("total_rev", 2).alias("total_revenue"),
        F.round(F.col("repeat_rev") / F.col("total_rev"), 6).alias(
            "repeat_share"
        ),
    )


@register(
    "welch_ttest_click_view",
    """
    WITH c AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    s AS (
      SELECT a, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cv) AS BIGINT) AS s1,
        CAST(sum(cv * cv) AS BIGINT) AS s2
      FROM c GROUP BY a
    ),
    w AS (
      SELECT
        max(CASE WHEN a = 1 THEN n END) AS n1,
        max(CASE WHEN a = 0 THEN n END) AS n2,
        CAST(max(CASE WHEN a = 1 THEN s1 END) AS DOUBLE) AS s11,
        CAST(max(CASE WHEN a = 0 THEN s1 END) AS DOUBLE) AS s12,
        CAST(max(CASE WHEN a = 1 THEN s2 END) AS DOUBLE) AS s21,
        CAST(max(CASE WHEN a = 0 THEN s2 END) AS DOUBLE) AS s22
      FROM s
    ),
    v AS (
      SELECT n1, n2,
        s11 / CAST(n1 AS DOUBLE) AS m1, s12 / CAST(n2 AS DOUBLE) AS m2,
        (s21 - s11 * s11 / CAST(n1 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE) / 10000.0 AS v1n,
        (s22 - s12 * s12 / CAST(n2 AS DOUBLE))
          / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE) / 10000.0 AS v2n
      FROM w
    )
    SELECT n1, n2,
      round(m1 / 100.0, 6) AS mean_click,
      round(m2 / 100.0, 6) AS mean_view,
      round((m1 - m2) / 100.0 / sqrt(v1n + v2n), 6) AS t_stat,
      round((v1n + v2n) * (v1n + v2n)
            / (v1n * v1n / (CAST(n1 AS DOUBLE) - 1.0)
               + v2n * v2n / (CAST(n2 AS DOUBLE) - 1.0)), 6) AS df
    FROM v
    """,
)
def q_welch_ttest_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (click-arm vs view-arm `value`)
    with the Welch-Satterthwaite df — the parametric sibling of
    mannwhitney_u_click_view for when means (not ranks) are the
    question and the two arms' variances can't be pooled. The
    per-arm sufficient statistics (n, Σx, Σx²) are EXACT BIGINTs in
    cents fixed-point (`value` is 2-decimal by construction; Σx² ≤
    (56e3)²·6e5 ≈ 2e15 stays inside bigint), so both engines feed the
    identical integers into one shared double expression tree —
    mean/t/df agree bit-for-bit before the round(6).

    Scale shape: one map-side-combinable hash aggregate over the
    filtered scan (3 sums per arm), then a 1-row final projection.
    Streaming twin: (n, Σx, Σx²) are plain mergeable sums — the
    Mann-Whitney windowed-partials recipe applies verbatim."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    c = ev.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.round(F.col("value") * 100).cast("bigint").alias("cv"),
    )
    s = c.groupBy("a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cv").alias("s1"),
        F.sum(F.col("cv") * F.col("cv")).alias("s2"),
    )
    pick = lambda arm, col: F.max(F.when(F.col("a") == arm, F.col(col)))
    w = s.agg(
        pick(1, "n").alias("n1"),
        pick(0, "n").alias("n2"),
        pick(1, "s1").cast("double").alias("s11"),
        pick(0, "s1").cast("double").alias("s12"),
        pick(1, "s2").cast("double").alias("s21"),
        pick(0, "s2").cast("double").alias("s22"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s11") / n1d
    m2 = F.col("s12") / n2d
    v1n = (
        (F.col("s21") - F.col("s11") * F.col("s11") / n1d)
        / (n1d - F.lit(1.0)) / n1d / F.lit(10000.0)
    )
    v2n = (
        (F.col("s22") - F.col("s12") * F.col("s12") / n2d)
        / (n2d - F.lit(1.0)) / n2d / F.lit(10000.0)
    )
    se2 = v1n + v2n
    return w.select(
        "n1",
        "n2",
        F.round(m1 / F.lit(100.0), 6).alias("mean_click"),
        F.round(m2 / F.lit(100.0), 6).alias("mean_view"),
        F.round((m1 - m2) / F.lit(100.0) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            se2 * se2
            / (
                v1n * v1n / (n1d - F.lit(1.0))
                + v2n * v2n / (n2d - F.lit(1.0))
            ),
            6,
        ).alias("df"),
    )


@register(
    "kruskal_wallis_value_by_type",
    """
    WITH e AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    gv AS (SELECT value, count(*) AS t FROM e GROUP BY value),
    cv AS (
      SELECT value, t, sum(t) OVER (ORDER BY value) - t AS below FROM gv
    ),
    gj AS (
      SELECT event_type, value, count(*) AS njv FROM e GROUP BY 1, 2
    ),
    rj AS (
      SELECT event_type,
        CAST(sum(CAST(njv AS DECIMAL(16, 0))
                 * CAST(2 * below + t + 1 AS DECIMAL(18, 0))) AS DOUBLE)
          AS r2j,
        CAST(sum(njv) AS BIGINT) AS nj
      FROM gj JOIN cv USING (value) GROUP BY event_type
    ),
    tt AS (
      SELECT
        CAST(sum(CAST(t AS DECIMAL(12, 0)) * t * t - t) AS DOUBLE) AS ties,
        CAST(sum(t) AS BIGINT) AS n
      FROM gv
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, max(tt.n) AS n,
        CAST(max(tt.n) AS DOUBLE) AS nd,
        sum((r2j / 2.0) * (r2j / 2.0) / CAST(nj AS DOUBLE)) AS sr,
        max(tt.ties) AS ties
      FROM rj, tt
    )
    SELECT k, n,
      round(12.0 / (nd * (nd + 1.0)) * sr - 3.0 * (nd + 1.0), 6) AS h,
      round((12.0 / (nd * (nd + 1.0)) * sr - 3.0 * (nd + 1.0))
            / (1.0 - ties / (nd * nd * nd - nd)), 6) AS h_adj
    FROM agg
    """,
)
def q_kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (tie-corrected) across ALL event types — the
    k-group generalization of mannwhitney_u_click_view: does `value`'s
    distribution differ across the 5 types? Rank sums never
    materialize per row: the doubled tie-average-rank identity
    2·R_j = Σ_v n_j(v)·(2·below(v) + t(v) + 1) needs only
    per-distinct-value counts, exact DECIMAL-integer until the 1-row
    final assembly; ties enter through Σ(t³−t). The only
    order-sensitive float step is the k-term (k=5) sum of R_j²/n_j,
    whose cross-engine spread (~4 ulps of 5e16 → ~1e-9 in H after the
    12/(N(N+1)) scaling) sits ~500× under the round(6) threshold.

    Scale shape: one hash agg on distinct values + one on
    (type, value), the TWO-PASS global_running_sum for below-counts
    (no single-partition window), a k-row reduce."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    gv = e.groupBy("value").agg(F.count(F.lit(1)).alias("t"))
    cva = global_running_sum(gv, ["value"], "t", "cum").withColumn(
        "below", F.col("cum") - F.col("t")
    )
    gj = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("njv")
    )
    rj = (
        gj.join(cva.select("value", "t", "below"), "value")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("njv").cast("decimal(16,0)")
                * (2 * F.col("below") + F.col("t") + 1).cast("decimal(18,0)")
            )
            .cast("double")
            .alias("r2j"),
            F.sum("njv").alias("nj"),
        )
    )
    td = F.col("t").cast("decimal(12,0)")
    tt = gv.agg(
        F.sum(td * td * td - F.col("t")).cast("double").alias("ties"),
        F.sum("t").alias("n"),
    )
    agg = rj.crossJoin(F.broadcast(tt)).agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("n"),
        F.max("n").cast("double").alias("nd"),
        F.sum(
            (F.col("r2j") / F.lit(2.0))
            * (F.col("r2j") / F.lit(2.0))
            / F.col("nj").cast("double")
        ).alias("sr"),
        F.max("ties").alias("ties"),
    )
    nd = F.col("nd")
    h = F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("sr") - F.lit(3.0) * (
        nd + F.lit(1.0)
    )
    corr = F.lit(1.0) - F.col("ties") / (nd * nd * nd - nd)
    return agg.select(
        "k", "n", F.round(h, 6).alias("h"), F.round(h / corr, 6).alias("h_adj")
    )


@register(
    "trimmed_mean_value_by_type",
    """
    WITH e AS (
      SELECT event_type, event_id,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, cv,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY cv, event_id) AS rk,
        count(*) OVER (PARTITION BY event_type) AS nt
      FROM e
    )
    SELECT event_type, CAST(max(nt) AS BIGINT) AS n,
      CAST(max(nt) // 10 AS BIGINT) AS n_trimmed_each_side,
      CAST(count(*) AS BIGINT) AS n_kept,
      round(CAST(sum(cv) AS DOUBLE) / count(*) / 100.0, 6) AS trimmed_mean
    FROM r
    WHERE rk > nt // 10 AND rk <= nt - nt // 10
    GROUP BY event_type
    """,
)
def q_trimmed_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of `value` per event type — the
    robust location estimate that survives the heavy tails winsorize
    clips (winsorize_value_per_type is the same family; trimming DROPS
    the tails instead of clamping them). Deterministic spec: rows rank
    by (cents, event_id) so value ties cut identically in both
    engines; the kept-range mean is an exact BIGINT cents sum divided
    once.

    Scale shape: per-type ranks WITHOUT per-type single-partition
    windows — the _doubled_avg_rank offset machinery: one global
    range-partitioned running count in (type, cents, event_id) order,
    minus each type's lexicographic predecessor totals via the
    |types|² triangular broadcast join; then one (type) hash agg over
    the kept rows."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
            F.lit(1).alias("one"),
        )
    )
    r = global_running_sum(
        e, ["event_type", "cv", "event_id"], "one", "gcum"
    )
    tot = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(
            F.broadcast(b),
            F.col("b.event_type") < F.col("a.event_type"),
            "left",
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.coalesce(F.sum("b.nt"), F.lit(0)).alias("off"),
            F.max("a.nt").alias("nt"),
        )
    )
    ranked = r.join(F.broadcast(off), "event_type").withColumn(
        "rk", F.col("gcum") - F.col("off")
    )
    kept = ranked.filter(
        (F.col("rk") > F.expr("nt div 10"))
        & (F.col("rk") <= F.col("nt") - F.expr("nt div 10"))
    )
    return kept.groupBy("event_type").agg(
        F.max("nt").cast("bigint").alias("n"),
        F.expr("max(nt) div 10").cast("bigint").alias(
            "n_trimmed_each_side"
        ),
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum("cv").cast("double") / F.count(F.lit(1)) / F.lit(100.0), 6
        ).alias("trimmed_mean"),
    )


@register(
    "mood_median_test",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    gv AS (SELECT cv, count(*) AS t FROM e GROUP BY cv),
    cum AS (SELECT cv, sum(t) OVER (ORDER BY cv) AS c FROM gv),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    med AS (
      SELECT min(cv) AS mcv FROM cum, n WHERE c >= (n + 1) // 2
    ),
    cells AS (
      SELECT event_type,
        CAST(sum(CASE WHEN cv <= mcv THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
        CAST(sum(CASE WHEN cv > mcv THEN 1 ELSE 0 END) AS BIGINT) AS n_gt
      FROM e, med GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_le) AS DOUBLE) AS tle,
        CAST(sum(n_gt) AS DOUBLE) AS tgt,
        CAST(sum(n_le + n_gt) AS DOUBLE) AS nn
      FROM cells
    ),
    chi AS (
      SELECT round(sum(
        (CAST(n_le AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * tle / nn)
          * (CAST(n_le AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * tle / nn)
          / (CAST(n_le + n_gt AS DOUBLE) * tle / nn)
        + (CAST(n_gt AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * tgt / nn)
          * (CAST(n_gt AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * tgt / nn)
          / (CAST(n_le + n_gt AS DOUBLE) * tgt / nn)
      ), 6) AS chi2
      FROM cells, tot
    )
    SELECT c.event_type, c.n_le, c.n_gt,
      round(CAST(m.mcv AS DOUBLE) / 100.0, 6) AS grand_median,
      chi.chi2
    FROM cells c, med m, chi
    """,
)
def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: does each event type sit above/below the
    GRAND median of `value` at the same rate? The k-group
    nonparametric test that needs only a 2×k contingency table — the
    cheapest multi-group location check (Kruskal-Wallis is the
    higher-power sibling; this one survives arbitrary outliers and
    needs no ranks). The grand median is the LOWER median — the
    ((N+1) div 2)-th smallest cents value — picked exactly via
    cumulative counts over distinct cents (no interpolation, so both
    engines agree on the exact BIGINT cut); cells are exact integer
    counts; only the final chi² (a 2k-term sum over k=5 types) is
    float, ~1e-15 spread vs the round(6) gate.

    Scale shape: ONE events scan feeding ONE (type, cents) hash
    aggregate — every later step (distinct-cents totals, the two-pass
    running sum for the median cut, the broadcast median join, the
    2×k cells) runs on that bounded-domain table. The small reused
    frames (gj, med, cells) are lazily pinned: each feeds several
    independent broadcast subtrees, and unpinned the scan+agg+running-
    sum lineages re-executed per consumer (r8 measured: 2.64 s naive →
    1.91 s pinned, isolated quiet sf0.1)."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
        )
    )
    # pin the one row-scale aggregate: the median cut, the n scalar and
    # the cells each re-enter this lineage from an independent subtree
    # (broadcast subqueries), so without the pin the events scan+agg
    # re-runs 3x (2.6 s -> ~1 s at sf0.1)
    gj = (
        e.groupBy("event_type", "cv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    gv = gj.groupBy("cv").agg(F.sum("cnt").alias("t"))
    cum = global_running_sum(gv, ["cv"], "t", "c")
    n = gv.agg(F.sum("t").alias("n"))
    # med (1 row) and cells (k rows) are each consumed by several
    # independent broadcast subtrees; pin them too or the two-pass
    # running-sum lineage under med re-executes per consumer
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("c") >= F.expr("(n + 1) div 2"))
        .agg(F.min("cv").alias("mcv"))
        .persist()
    )
    cells = (
        gj.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cv") <= F.col("mcv"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_le"),
            F.sum(
                F.when(F.col("cv") > F.col("mcv"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_gt"),
        )
        .persist()
    )
    tot = cells.agg(
        F.sum("n_le").cast("double").alias("tle"),
        F.sum("n_gt").cast("double").alias("tgt"),
        F.sum(F.col("n_le") + F.col("n_gt")).cast("double").alias("nn"),
    )
    rt = (F.col("n_le") + F.col("n_gt")).cast("double")
    ele = rt * F.col("tle") / F.col("nn")
    egt = rt * F.col("tgt") / F.col("nn")
    dle = F.col("n_le").cast("double") - ele
    dgt = F.col("n_gt").cast("double") - egt
    chi = (
        cells.crossJoin(F.broadcast(tot))
        .agg(F.round(F.sum(dle * dle / ele + dgt * dgt / egt), 6).alias("chi2"))
    )
    return (
        cells.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            "n_le",
            "n_gt",
            F.round(F.col("mcv").cast("double") / F.lit(100.0), 6).alias(
                "grand_median"
            ),
            "chi2",
        )
    )


@register(
    "grubbs_outlier_by_type",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cv) AS BIGINT) AS s1,
        CAST(sum(cv * cv) AS BIGINT) AS s2,
        CAST(min(cv) AS BIGINT) AS mn, CAST(max(cv) AS BIGINT) AS mx
      FROM e GROUP BY event_type
    )
    SELECT event_type, n,
      round(CAST(mn AS DOUBLE) / 100.0, 6) AS min_value,
      round(CAST(mx AS DOUBLE) / 100.0, 6) AS max_value,
      round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_value,
      round(
        (CAST(CASE WHEN s1 - n * mn >= n * mx - s1
                   THEN s1 - n * mn ELSE n * mx - s1 END AS DOUBLE)
         / CAST(n AS DOUBLE))
        / sqrt((CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0)),
        6) AS g
    FROM s
    """,
)
def q_grubbs_outlier_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic per event type: G = max|x − mean|/s —
    the single-most-extreme-point test that complements the
    per-row z-score/MAD anomaly feeds (anomaly_zscore_events /
    anomaly_mad_events flag rows; Grubbs asks whether the WORST row is
    statistically surprising at all). The extreme deviation is chosen
    with an EXACT integer comparison — max(mean−min, max−mean)
    ⇔ max(S1 − n·min, n·max − S1) in cents — so no float boundary
    picks different tails across engines; G's float assembly runs on
    identical exact (n, Σx, Σx², min, max).

    Scale shape: one map-side-combinable hash aggregate (5 scalars per
    type), k-row projection. All five inputs are plain mergeable
    aggregates, so the windowed-partials streaming recipe applies."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
        )
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cv").alias("s1"),
        F.sum(F.col("cv") * F.col("cv")).alias("s2"),
        F.min("cv").alias("mn"),
        F.max("cv").alias("mx"),
    )
    nd = F.col("n").cast("double")
    dev_lo = F.col("s1") - F.col("n") * F.col("mn")
    dev_hi = F.col("n") * F.col("mx") - F.col("s1")
    dev = F.when(dev_lo >= dev_hi, dev_lo).otherwise(dev_hi).cast("double")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
        )
        / (nd - F.lit(1.0))
    )
    return s.select(
        "event_type",
        "n",
        F.round(F.col("mn").cast("double") / F.lit(100.0), 6).alias(
            "min_value"
        ),
        F.round(F.col("mx").cast("double") / F.lit(100.0), 6).alias(
            "max_value"
        ),
        F.round(F.col("s1").cast("double") / nd / F.lit(100.0), 6).alias(
            "mean_value"
        ),
        F.round((dev / nd) / sd, 6).alias("g"),
    )


@register(
    "runs_test_daily_volume",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    sg AS (
      SELECT day,
        CASE WHEN n > lag(n) OVER (ORDER BY day) THEN 1
             WHEN n < lag(n) OVER (ORDER BY day) THEN -1 END AS sgn
      FROM d
    ),
    s AS (SELECT day, sgn FROM sg WHERE sgn IS NOT NULL),
    r AS (
      SELECT sgn,
        CASE WHEN sgn IS DISTINCT FROM lag(sgn) OVER (ORDER BY day)
             THEN 1 ELSE 0 END AS new_run
      FROM s
    ),
    agg AS (
      SELECT CAST(sum(new_run) AS BIGINT) AS runs,
        CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
        CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      FROM r
    )
    SELECT runs, n_up, n_down,
      round(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
            / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0, 6)
        AS mu,
      round((CAST(runs AS DOUBLE)
             - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0))
            / sqrt((2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                    / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)))
                   * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                      / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) - 1.0)
                   / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0)),
            6) AS z
    FROM agg
    """,
)
def q_runs_test_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-volume up/down sequence:
    too FEW runs = trending (momentum), too MANY = oscillating
    (overcorrection) — the randomness check a forecasting pipeline
    runs before trusting seasonal_naive_backtest residuals. Signs and
    the run count are exact integers from lag comparisons over the
    bounded day domain (30 days at sf0.01); μ and z assemble from
    (runs, n_up, n_down) in one shared double tree (zero-change days
    dropped, the standard two-category reduction).

    Scale shape: one (day) hash agg — the only row-scale exchange —
    then lag windows over the BOUNDED day domain (the
    analytics-precedent domain-bounded no-partition window), a 1-row
    reduce."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wday = Window.orderBy("day")
    sg = d.select(
        "day",
        F.when(F.col("n") > F.lag("n").over(wday), 1)
        .when(F.col("n") < F.lag("n").over(wday), -1)
        .alias("sgn"),
    ).filter(F.col("sgn").isNotNull())
    r = sg.select(
        "sgn",
        F.when(
            ~F.col("sgn").eqNullSafe(F.lag("sgn").over(Window.orderBy("day"))),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = r.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
    )
    nu, nd_ = F.col("n_up").cast("double"), F.col("n_down").cast("double")
    mu = F.lit(2.0) * nu * nd_ / (nu + nd_) + F.lit(1.0)
    var = (
        (F.lit(2.0) * nu * nd_ / (nu + nd_))
        * (F.lit(2.0) * nu * nd_ / (nu + nd_) - F.lit(1.0))
        / (nu + nd_ - F.lit(1.0))
    )
    return agg.select(
        "runs",
        "n_up",
        "n_down",
        F.round(mu, 6).alias("mu"),
        F.round((F.col("runs").cast("double") - mu) / F.sqrt(var), 6).alias(
            "z"
        ),
    )


@register(
    "ljung_box_daily_volume",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, n, row_number() OVER (ORDER BY day) AS i,
        CAST(count(*) OVER () AS BIGINT) AS nn,
        CAST(sum(n) OVER () AS BIGINT) AS tot
      FROM d
    ),
    dev AS (
      SELECT i, nn, CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) / nn AS dv
      FROM idx
    ),
    denom AS (SELECT CAST(max(nn) AS BIGINT) AS nn,
                     sum(dv * dv) AS s0 FROM dev),
    lags AS (
      SELECT k, sum(a.dv * b.dv) AS sk
      FROM (SELECT unnest([1, 2, 3]) AS k) lk
      JOIN dev a ON true
      JOIN dev b ON b.i = a.i + k
      GROUP BY k
    )
    SELECT CAST(max(d2.nn) AS BIGINT) AS n_days,
      round(max(CASE WHEN k = 1 THEN sk END) / max(s0), 6) AS r1,
      round(max(CASE WHEN k = 2 THEN sk END) / max(s0), 6) AS r2,
      round(max(CASE WHEN k = 3 THEN sk END) / max(s0), 6) AS r3,
      round(CAST(max(d2.nn) AS DOUBLE) * (CAST(max(d2.nn) AS DOUBLE) + 2.0)
        * ((max(CASE WHEN k = 1 THEN sk END) / max(s0))
           * (max(CASE WHEN k = 1 THEN sk END) / max(s0))
           / (CAST(max(d2.nn) AS DOUBLE) - 1.0)
         + (max(CASE WHEN k = 2 THEN sk END) / max(s0))
           * (max(CASE WHEN k = 2 THEN sk END) / max(s0))
           / (CAST(max(d2.nn) AS DOUBLE) - 2.0)
         + (max(CASE WHEN k = 3 THEN sk END) / max(s0))
           * (max(CASE WHEN k = 3 THEN sk END) / max(s0))
           / (CAST(max(d2.nn) AS DOUBLE) - 3.0)), 6) AS q_lb
    FROM lags, denom d2
    """,
)
def q_ljung_box_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over lags 1-3 of the daily event
    volume — the single-number "is there ANY autocorrelation left"
    test that wraps seasonality_autocorr's per-lag ACF into the
    standard χ²(3) statistic forecasting pipelines gate on before
    shipping a naive model. Lagged products come from an explicit
    self-join on day index (i, i+k) — identical row pairing in both
    engines, no window-frame ambiguity; devs are (exact count −
    exact-total/n) doubles; each float sum spans ≤30 terms (~1e-15
    order spread vs round 6).

    Scale shape: one (day) hash agg, then everything runs on the
    BOUNDED day domain (30 rows at sf0.01): index window, 3-lag
    self-join, 1-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wall = Window.partitionBy(F.lit(1))
    idx = d.select(
        "n",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count(F.lit(1)).over(wall).alias("nn"),
        F.sum("n").over(wall).alias("tot"),
    )
    dev = idx.select(
        "i",
        "nn",
        (
            F.col("n").cast("double")
            - F.col("tot").cast("double") / F.col("nn")
        ).alias("dv"),
    )
    denom = dev.agg(
        F.max("nn").alias("nn"), F.sum(F.col("dv") * F.col("dv")).alias("s0")
    )
    lk = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    a = dev.alias("a")
    b = dev.select(F.col("i").alias("bi"), F.col("dv").alias("bdv"))
    lags = (
        F.broadcast(lk)
        .crossJoin(a)
        .join(b, F.col("bi") == F.col("i") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("dv") * F.col("bdv")).alias("sk"))
    )
    j = lags.crossJoin(F.broadcast(denom))
    nnd = F.max("nn").cast("double")

    def rk(k):
        return F.max(F.when(F.col("k") == k, F.col("sk"))) / F.max("s0")

    q_lb = (
        nnd
        * (nnd + F.lit(2.0))
        * (
            rk(1) * rk(1) / (nnd - F.lit(1.0))
            + rk(2) * rk(2) / (nnd - F.lit(2.0))
            + rk(3) * rk(3) / (nnd - F.lit(3.0))
        )
    )
    return j.agg(
        F.max("nn").cast("bigint").alias("n_days"),
        F.round(rk(1), 6).alias("r1"),
        F.round(rk(2), 6).alias("r2"),
        F.round(rk(3), 6).alias("r3"),
        F.round(q_lb, 6).alias("q_lb"),
    )


@register(
    "cochran_armitage_trend",
    """
    WITH e AS (
      SELECT dayofweek(ts) + 1 AS s,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      FROM events
    ),
    cells AS (
      SELECT s, CAST(count(*) AS BIGINT) AS ni,
        CAST(sum(x) AS BIGINT) AS xi
      FROM e GROUP BY s
    ),
    tot AS (
      SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS x,
        CAST(sum(s * xi) AS BIGINT) AS sx,
        CAST(sum(s * ni) AS BIGINT) AS sn,
        CAST(sum(s * s * ni) AS BIGINT) AS ssn
      FROM cells
    )
    SELECT n, x,
      round((CAST(sx AS DOUBLE)
             - CAST(x AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE))
            / sqrt(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                   * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(ssn AS DOUBLE)
                      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                        / CAST(n AS DOUBLE))),
            6) AS z_trend
    FROM tot
    """,
)
def q_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the purchase RATE trend
    monotonically across the ordered day-of-week scores 1..7? The
    ordered-alternative refinement of chi_square_independence — a flat
    χ² can miss a clean monotone drift that this z catches with one
    degree of freedom. Everything up to the final z is five exact
    BIGINT sufficient statistics (n, x, Σs·x, Σs·n, Σs²·n) from one
    pass; the z assembles from them in one shared double tree.

    Scale shape: one map-side-combinable (dow) hash aggregate — 7
    cells — then a 1-row reduce. Mergeable sums throughout, so the
    windowed-partials streaming recipe applies verbatim."""
    e = load_table(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    cells = e.groupBy("s").agg(
        F.count(F.lit(1)).alias("ni"), F.sum("x").alias("xi")
    )
    tot = cells.agg(
        F.sum("ni").alias("n"),
        F.sum("xi").alias("x"),
        F.sum(F.col("s") * F.col("xi")).alias("sx"),
        F.sum(F.col("s") * F.col("ni")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("ni")).alias("ssn"),
    )
    nd = F.col("n").cast("double")
    xd = F.col("x").cast("double")
    p = xd / nd
    num = F.col("sx").cast("double") - xd * F.col("sn").cast("double") / nd
    var = p * (F.lit(1.0) - p) * (
        F.col("ssn").cast("double")
        - F.col("sn").cast("double") * F.col("sn").cast("double") / nd
    )
    return tot.select(
        "n", "x", F.round(num / F.sqrt(var), 6).alias("z_trend")
    )


@register(
    "chi_square_gof_uniform",
    """
    WITH cells AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n_obs) AS BIGINT) AS nn,
        CAST(count(*) AS BIGINT) AS k
      FROM cells
    ),
    chi AS (
      SELECT round(sum(
        (CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) / CAST(k AS DOUBLE))
          * (CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) / CAST(k AS DOUBLE))
          / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE))), 6) AS chi2,
        CAST(max(k) - 1 AS BIGINT) AS df
      FROM cells, tot
    )
    SELECT c.event_type, c.n_obs,
      round(CAST(t.nn AS DOUBLE) / CAST(t.k AS DOUBLE), 6) AS expected,
      chi.chi2, chi.df
    FROM cells c, tot t, chi
    """,
)
def q_chi_square_gof_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square GOODNESS-OF-FIT: do event-type counts fit a uniform
    distribution over the observed k types? The one-sample sibling of
    chi_square_independence (that one tests association between TWO
    categoricals; this one tests one categorical against a fixed
    expected law) — the classic sanity check that an ingest's category
    mix hasn't collapsed onto a few values. Sufficient statistics are
    just the k observed counts (plain mergeable SUMS), so the windowed-
    partials streaming recipe applies verbatim — the 11th mergeable-
    twin member (tests/test_streaming.py). Cells are exact BIGINTs;
    only the final k-term chi² is float, ~1e-15 spread vs round(6).

    Scale shape: one map-side-combinable hash aggregate to k cells,
    then a 1-row reduce broadcast back — no shuffle beyond the k-cell
    agg at any data size."""
    e = load_table(spark, sf_dir, "events").select("event_type")
    cells = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = cells.agg(
        F.sum("n_obs").alias("nn"), F.count(F.lit(1)).alias("k")
    )
    exp = F.col("nn").cast("double") / F.col("k").cast("double")
    d = F.col("n_obs").cast("double") - exp
    chi = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(d * d / exp), 6).alias("chi2"),
            (F.max("k") - F.lit(1)).cast("bigint").alias("df"),
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            "n_obs",
            F.round(exp, 6).alias("expected"),
            "chi2",
            "df",
        )
    )


@register(
    "mann_kendall_trend_daily",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.n > a.n THEN 1
                           WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.day < b.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY n)
    )
    SELECT s.s, nn.nd,
      round((CAST(nd AS DOUBLE) * (nd - 1) * (2 * nd + 5)
             - CAST(tie_term AS DOUBLE)) / 18.0, 6) AS var_s,
      round(CASE WHEN s.s > 0 THEN (CAST(s.s AS DOUBLE) - 1.0)
                 WHEN s.s < 0 THEN (CAST(s.s AS DOUBLE) + 1.0)
                 ELSE 0.0 END
            / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2 * nd + 5)
                    - CAST(tie_term AS DOUBLE)) / 18.0), 6) AS z_mk
    FROM s, nn, ties
    """,
)
def q_mann_kendall_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily event volume: S = Σ_{i<j}
    sign(n_j − n_i) with the tie-corrected variance — the rank-based
    monotone-trend detector that needs no distributional assumption
    (the nonparametric sibling of cochran_armitage_trend, which tests
    a RATE; this tests the LEVEL). S, the day count, and the tie term
    are exact BIGINTs; var and the continuity-corrected z assemble in
    one shared double tree, round-6 gated.

    Scale shape: ONE events scan into a (day) hash aggregate, then all
    pairwise work runs on the BOUNDED day domain (≤ a few hundred rows
    at any corpus size — the self-join is broadcast, O(days²) on tiny
    data). The 100 TB cost is the scan, as it should be."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a, b = d.alias("a"), d.alias("b")
    s = a.join(F.broadcast(b), F.col("a.day") < F.col("b.day")).agg(
        F.sum(
            F.when(F.col("b.n") > F.col("a.n"), 1)
            .when(F.col("b.n") < F.col("a.n"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s")
    )
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ties = (
        d.groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nd = F.col("nd").cast("double")
    var_s = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term").cast("double")) / 18.0
    sd = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, sd - 1.0)
        .when(F.col("s") < 0, sd + 1.0)
        .otherwise(0.0)
    ) / F.sqrt(var_s)
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "s",
            "nd",
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 6).alias("z_mk"),
        )
    )


@register(
    "eb_shrunk_purchase_rate",
    """
    WITH u AS (
      SELECT user_id,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x,
        CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    fp AS (
      SELECT user_id, x, n,
        CAST(floor(1000000.0 * x / n) AS BIGINT) AS r_fp
      FROM u
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS uu,
        CAST(sum(r_fp) AS BIGINT) AS sr,
        CAST(sum(r_fp * r_fp) AS BIGINT) AS sr2
      FROM fp
    ),
    pri AS (
      SELECT uu, sr, sr2,
        CAST(sr AS DOUBLE) / uu / 1000000.0 AS mm,
        (CAST(sr2 AS DOUBLE) / uu
         - (CAST(sr AS DOUBLE) / uu) * (CAST(sr AS DOUBLE) / uu))
          / 1000000000000.0 AS vv
      FROM m
    ),
    cc AS (
      SELECT greatest(mm * (1.0 - mm) / vv - 1.0, 0.0) AS c, mm
      FROM pri
    ),
    sh AS (
      SELECT f.user_id, f.x, f.n,
        round((CAST(f.x AS DOUBLE) + cc.mm * cc.c)
              / (CAST(f.n AS DOUBLE) + cc.c), 6) AS shrunk_rate
      FROM fp f, cc
    )
    SELECT user_id, x, n, shrunk_rate,
      CAST(row_number() OVER (ORDER BY shrunk_rate DESC, user_id)
           AS BIGINT) AS rank
    FROM sh
    QUALIFY rank <= 20
    """,
)
def q_eb_shrunk_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates
    (beta-binomial method of moments): a user with 1 purchase in 2
    events should NOT outrank one with 40 in 100 — raw rates explode
    on small n, so each rate is shrunk toward the corpus prior with
    strength c = m(1−m)/v − 1 (floored at 0 for under-dispersed
    corpora). THE ranking-denoiser every CTR/quality leaderboard
    needs. Cross-engine exactness: per-user rates enter the prior
    moments as FIXED-POINT integers (floor(1e6·x/n) — exact: 1e6·x <
    2^53 and the true rational sits ≥ 1/n ≫ 1 ulp from the floor
    boundary), so Σr and Σr² are exact BIGINTs and m, v, c, and every
    shrunk rate assemble in one shared double tree; top-20 cut on the
    ROUNDED rate (tie-break user_id), the dirichlet_lm_topk pattern.

    Scale shape: one (user) hash aggregate, a 1-row prior reduce
    broadcast back, TakeOrderedAndProject top-20 — no row-scale
    window, no second scan."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.count(F.lit(1)).alias("n"),
    )
    fp = u.withColumn(
        "r_fp",
        F.floor(F.lit(1000000.0) * F.col("x") / F.col("n")).cast("bigint"),
    )
    m = fp.agg(
        F.count(F.lit(1)).alias("uu"),
        F.sum("r_fp").alias("sr"),
        F.sum(F.col("r_fp") * F.col("r_fp")).alias("sr2"),
    )
    uu = F.col("uu").cast("double")
    mm = F.col("sr").cast("double") / uu / F.lit(1000000.0)
    vv = (
        F.col("sr2").cast("double") / uu
        - (F.col("sr").cast("double") / uu)
        * (F.col("sr").cast("double") / uu)
    ) / F.lit(1000000000000.0)
    cc = m.select(
        F.greatest(mm * (1.0 - mm) / vv - 1.0, F.lit(0.0)).alias("c"),
        mm.alias("mm"),
    )
    sh = fp.crossJoin(F.broadcast(cc)).select(
        "user_id",
        "x",
        "n",
        F.round(
            (F.col("x").cast("double") + F.col("mm") * F.col("c"))
            / (F.col("n").cast("double") + F.col("c")),
            6,
        ).alias("shrunk_rate"),
    )
    # r13: the code now matches the docstring — explicit
    # TakeOrderedAndProject top-20 (orderBy().limit()). Plan-NEUTRAL on
    # Spark 4 (InferWindowGroupLimit already limited under the window;
    # verified in plans/r13/eb_shrunk_purchase_rate_*) — kept so the
    # heap cut is explicit, not optimizer-dependent. Bit-identical
    # (rounded rate before the cut, unique user_id tie-break).
    w = Window.orderBy(F.col("shrunk_rate").desc(), F.col("user_id").asc())
    return (
        sh.orderBy(F.col("shrunk_rate").desc(), F.col("user_id").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


@register(
    "jackknife_purchase_view_ratio",
    """
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS p,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(p) AS BIGINT) AS pp,
        CAST(sum(v) AS BIGINT) AS vv
      FROM d
    ),
    loo AS (
      SELECT CAST(floor(1000000.0 * (pp - p) / (vv - v)) AS BIGINT)
        AS l_fp
      FROM d, tot
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(l_fp) AS BIGINT) AS sl,
        CAST(sum(l_fp * l_fp) AS BIGINT) AS sl2
      FROM loo
    )
    SELECT tot.dd AS n_days,
      round(CAST(tot.pp AS DOUBLE) / CAST(tot.vv AS DOUBLE), 6) AS theta,
      round(sqrt((CAST(s.dd AS DOUBLE) - 1.0) / CAST(s.dd AS DOUBLE)
                 * (CAST(s.sl2 AS DOUBLE)
                    - CAST(s.sl AS DOUBLE) * CAST(s.sl AS DOUBLE)
                      / CAST(s.dd AS DOUBLE)))
            / 1000000.0, 6) AS jk_se
    FROM tot, s
    """,
)
def q_jackknife_purchase_view_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete-one-DAY jackknife standard error of the corpus
    purchase/view ratio — the variance a ratio estimator needs before
    anyone compares two of them (ratios of sums have no closed-form
    SE; the jackknife is the assumption-free workhorse, and deleting
    whole DAYS respects the within-day correlation that a per-row
    bootstrap would ignore). Cross-engine exactness: daily (p, v) are
    exact BIGINTs; each leave-one-out ratio enters the variance as a
    FIXED-POINT integer (floor(1e6·(P−p_d)/(V−v_d)) — the repo's
    fixed-point discipline: never sum raw doubles across engines; 1e6
    rather than 1e9 scale keeps Σl² under 2^63 in Spark's ANSI
    BIGINT sum for any day count, at a quantization cost of ~1e-6 on
    the SE, identical in both engines), so
    Σl and Σl² are exact and the SE assembles in one shared double
    tree. jk_se = sqrt((D−1)/D · Σ(l_d − l̄)²) via the sum-of-squares
    identity on exact integers.

    Scale shape: one scan to the bounded day domain, a broadcast
    1-row totals join, two 1-row reduces."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("dd"),
        F.sum("p").alias("pp"),
        F.sum("v").alias("vv"),
    )
    loo = d.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.lit(1000000.0)
            * (F.col("pp") - F.col("p"))
            / (F.col("vv") - F.col("v"))
        )
        .cast("bigint")
        .alias("l_fp")
    )
    s = loo.agg(
        F.count(F.lit(1)).alias("dd"),
        F.sum("l_fp").alias("sl"),
        F.sum(F.col("l_fp") * F.col("l_fp")).alias("sl2"),
    )
    sdd = F.col("dd").cast("double")
    ss = (
        F.col("sl2").cast("double")
        - F.col("sl").cast("double") * F.col("sl").cast("double") / sdd
    )
    return tot.crossJoin(F.broadcast(s.select(
        F.col("dd").alias("s_dd"), "sl", "sl2"
    ))).select(
        F.col("dd").alias("n_days"),
        F.round(
            F.col("pp").cast("double") / F.col("vv").cast("double"), 6
        ).alias("theta"),
        F.round(
            F.sqrt(
                (F.col("s_dd").cast("double") - 1.0)
                / F.col("s_dd").cast("double")
                * (
                    F.col("sl2").cast("double")
                    - F.col("sl").cast("double")
                    * F.col("sl").cast("double")
                    / F.col("s_dd").cast("double")
                )
            )
            / F.lit(1000000.0),
            6,
        ).alias("jk_se"),
    )


@register(
    "capture_recapture_users",
    """
    WITH s1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE EXTRACT(day FROM ts) <= 15
    ),
    s2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE EXTRACT(day FROM ts) > 15
    ),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
        (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
        (SELECT CAST(count(*) AS BIGINT)
         FROM s1 JOIN s2 USING (user_id)) AS m,
        (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
          AS exact_total
    )
    SELECT n1, n2, m,
      round((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
            / (CAST(m AS DOUBLE) + 1.0) - 1.0, 6) AS chapman_estimate,
      exact_total
    FROM c
    """,
)
def q_capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the distinct-user
    population from two occasions (days 1-15 vs 16+): N̂ =
    (n1+1)(n2+1)/(m+1) − 1 — the mark-recapture estimator a pipeline
    uses to size a population it can only SAMPLE (how many distinct
    users/entities exist when no occasion sees them all; the exact
    total rides along so the driver hash also pins the estimator's
    input-side counts). All four inputs are exact BIGINT distinct
    counts; the estimate is one shared double expression, round-6.

    Scale shape: two distinct-aggregates and a semi-join-shaped
    overlap count on the user key (one shuffle each), 1-row output —
    at 100 TB each distinct is the standard two-stage partial
    aggregate, or swaps to the oracled HLL portable sketches when ±1%
    suffices."""
    ev = load_table(spark, sf_dir, "events")
    s1 = ev.filter(F.dayofmonth("ts") <= 15).select("user_id").distinct()
    s2 = ev.filter(F.dayofmonth("ts") > 15).select("user_id").distinct()
    n1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    m = s1.join(s2, "user_id").agg(F.count(F.lit(1)).alias("m"))
    et = ev.agg(F.countDistinct("user_id").alias("exact_total"))
    c = (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(et))
    )
    return c.select(
        "n1",
        "n2",
        "m",
        F.round(
            (F.col("n1").cast("double") + 1.0)
            * (F.col("n2").cast("double") + 1.0)
            / (F.col("m").cast("double") + 1.0)
            - 1.0,
            6,
        ).alias("chapman_estimate"),
        "exact_total",
    )


@register(
    "fellegi_sunter_linkage",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        right(c_name, 2) AS nm2
      FROM customer
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM c),
    useg AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c
            GROUP BY c_mktsegment)
    ),
    ubal AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c GROUP BY bal_band)
    ),
    uph AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c GROUP BY nm2)
    ),
    uu AS (
      SELECT
        CAST(useg.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_seg,
        CAST(ubal.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_bal,
        CAST(uph.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_nm
      FROM useg, ubal, uph, n
    ),
    pr AS (
      SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        CAST(a.c_mktsegment = b.c_mktsegment AS BIGINT) AS agr_seg,
        CAST(a.bal_band = b.bal_band AS BIGINT) AS agr_bal,
        CAST(a.nm2 = b.nm2 AS BIGINT) AS agr_nm
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    ),
    sc AS (
      SELECT cust_a, cust_b, agr_seg, agr_bal, agr_nm,
        round(
          (CASE WHEN agr_seg = 1 THEN ln(0.9 / u_seg)
                ELSE ln(0.1 / (1.0 - u_seg)) END
           + CASE WHEN agr_bal = 1 THEN ln(0.9 / u_bal)
                  ELSE ln(0.1 / (1.0 - u_bal)) END
           + CASE WHEN agr_nm = 1 THEN ln(0.9 / u_nm)
                  ELSE ln(0.1 / (1.0 - u_nm)) END) / ln(2.0), 6)
          AS match_weight
      FROM pr, uu
    )
    SELECT cust_a, cust_b, agr_seg, agr_bal, agr_nm, match_weight,
      CAST(row_number() OVER (ORDER BY match_weight DESC, cust_a, cust_b)
           AS BIGINT) AS rank
    FROM sc
    QUALIFY rank <= 20
    """,
)
def q_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over nation-blocked
    customer pairs: per-field agreement weights log₂(m/u) (agree) /
    log₂((1−m)/(1−u)) (disagree) summed into a match weight — THE
    classical entity-resolution scoring rule, the record-level sibling
    of the document dedup family. m is the fixed literature prior 0.9
    per field (a labeled-EM fit isn't SQL-expressible; frozen like the
    quality classifier's serving coefficients); u is estimated EXACTLY
    from the data as the random-agreement probability
    Σ n_v(n_v−1) / N(N−1) per field (segment, 1k-balance band, and the
    last-2-digits-of-name stand-in quasi-identifier — the synthetic
    customer table has no phone/address columns) — exact BIGINT pair
    counts, one double division.
    Each pair's weight is one shared per-row double expression (no
    cross-row float accumulation); top-20 cut on the ROUNDED weight
    with (cust_a, cust_b) tie-break, the dirichlet pattern.

    Scale shape: blocking on c_nationkey bounds the pair join
    (block² per nation, the standard linkage discipline — at 100 TB
    the block key refines to nation × phone-prefix); the u table is a
    broadcast 1-row frame; top-20 is TakeOrderedAndProject."""
    return _fs_top20(spark, sf_dir)


def _fs_scored_pairs(
    spark: SparkSession, sf_dir: str, refine_nm: bool = False
) -> DataFrame:
    """Scored Fellegi-Sunter pair frame (cust_a, cust_b, agr_*,
    match_weight) — shared by the top-20 linkage query and
    entity_resolution_clusters. `refine_nm=True` REFINES the block key
    from c_nationkey to (c_nationkey, nm2): candidates shrink by ~the
    nm2 cardinality while every pair that can clear the ≥8-bit link
    threshold survives (with this fixture's u-values the nm2-disagree
    branch tops out below 8 bits — the u table itself still comes from
    the full table, so scores are unchanged). This is the 100 TB lever
    the linkage docstring names: blocking cost is Σ block², and the
    refined key divides block sizes without touching the scoring
    core."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        F.expr("right(c_name, 2)").alias("nm2"),
    )
    n = cust.agg(F.count(F.lit(1)).alias("nn"))

    def u_of(col: str, alias: str):
        return (
            cust.groupBy(col)
            .agg(F.count(F.lit(1)).alias("v"))
            .agg(
                F.sum(F.col("v") * (F.col("v") - 1)).alias(alias)
            )
        )

    uu = (
        u_of("c_mktsegment", "ap_seg")
        .crossJoin(F.broadcast(u_of("bal_band", "ap_bal")))
        .crossJoin(F.broadcast(u_of("nm2", "ap_nm")))
        .crossJoin(F.broadcast(n))
        .select(
            *[
                (
                    F.col(ap).cast("double")
                    / (
                        F.col("nn").cast("double")
                        * (F.col("nn").cast("double") - 1.0)
                    )
                ).alias(u)
                for ap, u in (
                    ("ap_seg", "u_seg"),
                    ("ap_bal", "u_bal"),
                    ("ap_nm", "u_nm"),
                )
            ]
        )
    )
    a, b = cust.alias("a"), cust.alias("b")
    block = (F.col("a.c_nationkey") == F.col("b.c_nationkey")) & (
        F.col("a.c_custkey") < F.col("b.c_custkey")
    )
    if refine_nm:
        block = block & (F.col("a.nm2") == F.col("b.nm2"))
    pr = a.join(b, block).select(
        F.col("a.c_custkey").alias("cust_a"),
        F.col("b.c_custkey").alias("cust_b"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        .cast("bigint")
        .alias("agr_seg"),
        (F.col("a.bal_band") == F.col("b.bal_band"))
        .cast("bigint")
        .alias("agr_bal"),
        (F.col("a.nm2") == F.col("b.nm2")).cast("bigint").alias("agr_nm"),
    )
    # r12: hoist the log() weight constants into the 1-row broadcast —
    # the old per-pair form evaluated six log() calls per blocked pair
    # (3·|pairs| agree + disagree branches, ~27M libm calls at sf0.1
    # across the two consumers). The hoisted columns are the SAME IEEE
    # doubles (identical ops on identical operands, computed once), so
    # every rounded match_weight is bit-identical — oracle-pinned.
    ww = uu.select(
        *[
            expr.alias(name)
            for u, f in (("u_seg", "seg"), ("u_bal", "bal"), ("u_nm", "nm"))
            for name, expr in (
                (f"wa_{f}", F.log(0.9 / F.col(u))),
                (f"wd_{f}", F.log(0.1 / (1.0 - F.col(u)))),
            )
        ]
    )
    term = lambda agr, f: F.when(  # noqa: E731 - local expression builder
        F.col(agr) == 1, F.col(f"wa_{f}")
    ).otherwise(F.col(f"wd_{f}"))
    sc = pr.crossJoin(F.broadcast(ww)).select(
        "cust_a",
        "cust_b",
        "agr_seg",
        "agr_bal",
        "agr_nm",
        F.round(
            (
                term("agr_seg", "seg")
                + term("agr_bal", "bal")
                + term("agr_nm", "nm")
            )
            / F.log(F.lit(2.0)),
            6,
        ).alias("match_weight"),
    )
    return sc


def _fs_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = _fs_scored_pairs(spark, sf_dir)
    # r13 audit note: the explicit orderBy().limit(20) is PLAN-NEUTRAL
    # on Spark 4 — InferWindowGroupLimit already planted a
    # TakeOrderedAndProject under the rank window for the old
    # row_number+filter form (verified: before/after plan shapes are
    # identical, plans/r13/fellegi_sunter_linkage_*), so the feared
    # single-task sort of the 4.5M-pair table never existed. Kept
    # because it makes the heap cut explicit rather than
    # optimizer-dependent. Bit-identical: match_weight is rounded
    # BEFORE the cut and (cust_a, cust_b) is a unique total tie-break.
    order = [
        F.col("match_weight").desc(),
        F.col("cust_a").asc(),
        F.col("cust_b").asc(),
    ]
    top = sc.orderBy(*order).limit(20)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    ).filter(F.col("rank") <= 20)


#: the Fellegi-Sunter scored-pair CTE chain, shared by the top-20 query
#: and the entity-resolution clustering oracle (threshold applied by
#: the consumer)
_FS_PAIRS_SQL = """c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        right(c_name, 2) AS nm2
      FROM customer
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM c),
    useg AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c
            GROUP BY c_mktsegment)
    ),
    ubal AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c GROUP BY bal_band)
    ),
    uph AS (
      SELECT CAST(sum(v * (v - 1)) AS BIGINT) AS agree_pairs
      FROM (SELECT CAST(count(*) AS BIGINT) AS v FROM c GROUP BY nm2)
    ),
    uu AS (
      SELECT
        CAST(useg.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_seg,
        CAST(ubal.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_bal,
        CAST(uph.agree_pairs AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS u_nm
      FROM useg, ubal, uph, n
    ),
    pr AS (
      SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        CAST(a.c_mktsegment = b.c_mktsegment AS BIGINT) AS agr_seg,
        CAST(a.bal_band = b.bal_band AS BIGINT) AS agr_bal,
        CAST(a.nm2 = b.nm2 AS BIGINT) AS agr_nm
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    ),
    fs_sc AS (
      SELECT cust_a, cust_b, agr_seg, agr_bal, agr_nm,
        round(
          (CASE WHEN agr_seg = 1 THEN ln(0.9 / u_seg)
                ELSE ln(0.1 / (1.0 - u_seg)) END
           + CASE WHEN agr_bal = 1 THEN ln(0.9 / u_bal)
                  ELSE ln(0.1 / (1.0 - u_bal)) END
           + CASE WHEN agr_nm = 1 THEN ln(0.9 / u_nm)
                  ELSE ln(0.1 / (1.0 - u_nm)) END) / ln(2.0), 6)
          AS match_weight
      FROM pr, uu
    )"""


@register(
    "entity_resolution_clusters",
    f"""
    WITH RECURSIVE {_FS_PAIRS_SQL},
    links AS (
      SELECT cust_a, cust_b FROM fs_sc WHERE match_weight >= 8.0
    ),
    edges AS (
      SELECT cust_a AS a, cust_b AS b FROM links
      UNION ALL SELECT cust_b, cust_a FROM links
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS cust, MIN(lab) AS cluster FROM reach GROUP BY node
    """,
)
def q_entity_resolution_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end entity resolution: Fellegi-Sunter match weights over
    nation-blocked customer pairs, a ≥8-bit link threshold (in this
    field setup only all-three-fields-agree pairs clear it — the
    high-precision operating point), then min-label connected
    components to turn pairwise links into ENTITY ids — the
    record-level twin of dedup_cluster_assignment's document pipeline
    (match → link → consolidate is the canonical linkage architecture;
    the threshold is applied to the ROUND-6 weight so both engines cut
    identically). The oracle recomputes true components via a
    recursive CTE over the identical scored-pair set, certifying the
    propagation fixpoint on this graph.

    Scale shape: the blocked pair join + broadcast u-table from the
    linkage query, then iterative label propagation whose state is
    (node, label) int pairs — one keyed shuffle per round, never
    adjacency blowups."""
    from ..operators.dedup import connected_components

    links = _fs_scored_pairs(spark, sf_dir).filter(
        F.col("match_weight") >= 8.0
    )
    return connected_components(
        links, a_col="cust_a", b_col="cust_b"
    ).select(F.col("node").alias("cust"), F.col("cluster"))


@register(
    "entity_resolution_refined_blocks",
    f"""
    WITH RECURSIVE {_FS_PAIRS_SQL},
    links AS (
      SELECT cust_a, cust_b FROM fs_sc WHERE match_weight >= 8.0
    ),
    edges AS (
      SELECT cust_a AS a, cust_b AS b FROM links
      UNION ALL SELECT cust_b, cust_a FROM links
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS cust, MIN(lab) AS cluster FROM reach GROUP BY node
    """,
)
def q_entity_resolution_refined_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Block-key REFINEMENT certificate for the linkage family
    (VERDICT r9 §8): the engine blocks on (c_nationkey, nm2) —
    shrinking candidate pairs by ~the nm2 cardinality — while the
    ORACLE keeps the full nation-block pair set, so the driver's
    value-hash equality certifies the refinement is LOSSLESS at the
    ≥8-bit operating point: with this fixture's u-values, no
    nm2-disagreeing pair can reach 8 bits (max ≈ 6.9), hence the
    refined candidate set contains every link. Candidate-count drop
    measured in scripts/scale_probe_linkage_refined.py (NOTES r10).

    Scale shape: linkage cost is Σ block² over blocks; refining the
    key from nation (|blocks| ≈ 25) to nation×nm2 (≈ 25·100) divides
    per-block size by the nm2 spread at identical output — THE
    standard linkage scale lever (at 100 TB refine again: phone
    prefix, zip, soundex)."""
    from ..operators.dedup import connected_components

    links = _fs_scored_pairs(spark, sf_dir, refine_nm=True).filter(
        F.col("match_weight") >= 8.0
    )
    return connected_components(
        links, a_col="cust_a", b_col="cust_b"
    ).select(F.col("node").alias("cust"), F.col("cluster"))


@register(
    "shapley_channel_attribution",
    """
    WITH u AS (
      SELECT user_id,
        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS mask,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    st AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS nu,
        CAST(sum(conv) AS BIGINT) AS nc
      FROM u GROUP BY mask
    ),
    grid AS (SELECT unnest(range(0, 16)) AS m),
    v AS (
      SELECT grid.m,
        CAST(coalesce(floor(1000000000.0 * st.nc / st.nu), 0) AS BIGINT)
          AS vfp
      FROM grid LEFT JOIN st ON st.mask = grid.m
    ),
    ch AS (SELECT unnest(range(0, 4)) AS c),
    terms AS (
      SELECT ch.c,
        CASE ((v0.m & 1) + ((v0.m >> 1) & 1) + ((v0.m >> 2) & 1)
              + ((v0.m >> 3) & 1))
          WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
          * (v1.vfp - v0.vfp) AS t
      FROM ch
      JOIN v v0 ON ((v0.m >> ch.c) & 1) = 0
      JOIN v v1 ON v1.m = v0.m + (1 << ch.c)
    )
    SELECT CASE c WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                  WHEN 2 THEN 'signup' ELSE 'error' END AS channel,
      round(CAST(sum(t) AS DOUBLE) / 24000000000.0, 6) AS shapley_value
    FROM terms GROUP BY c
    """,
)
def q_shapley_channel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shapley-value channel attribution (data-driven attribution, the
    coalition-game answer to last_touch_attribution / time_decay's
    heuristics): coalition value v(S) = empirical conversion rate of
    users whose channel SET is exactly S (the 4 non-purchase event
    types as channels), and each channel's credit is its exact Shapley
    value φ_c = Σ_{S∌c} |S|!(k−1−|S|)!/k! · (v(S∪c) − v(S)) over the
    full 2⁴ subset lattice. Unobserved subsets contribute v = 0 (the
    standard empirical-DDA convention, stated not hidden). Cross-engine
    exactness: v enters as FIXED-POINT floor(1e9·nc/nu) BIGINTs and the
    k=4 weights ×24 are the INTEGERS {6,2,2,6}, so every φ is an exact
    integer sum divided once by 24e9 — no double accumulates across
    rows. Efficiency holds by construction: Σφ_c = v(full) − v(∅).

    Scale shape: one (user) hash aggregate over the corpus, one (mask)
    aggregate to ≤16 rows, then the whole lattice walk on broadcast
    16-row frames — at 100 TB the only row-scale exchange is the user
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 4 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            + 8 * F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
        ).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    st = u.groupBy("mask").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("conv").alias("nc")
    )
    grid = spark.range(0, 16).select(F.col("id").cast("int").alias("m"))
    v = grid.join(
        F.broadcast(st), F.col("m") == F.col("mask"), "left"
    ).select(
        "m",
        F.coalesce(
            F.floor(F.lit(1000000000.0) * F.col("nc") / F.col("nu")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("vfp"),
    )
    ch = spark.range(0, 4).select(F.col("id").cast("int").alias("c"))
    v0 = v.select(F.col("m").alias("m0"), F.col("vfp").alias("vfp0"))
    v1 = v.select(F.col("m").alias("m1"), F.col("vfp").alias("vfp1"))
    popcount = (
        F.col("m0").bitwiseAND(1)
        + F.shiftright("m0", 1).bitwiseAND(1)
        + F.shiftright("m0", 2).bitwiseAND(1)
        + F.shiftright("m0", 3).bitwiseAND(1)
    )
    w24 = (
        F.when(popcount == 0, 6)
        .when(popcount == 1, 2)
        .when(popcount == 2, 2)
        .otherwise(6)
    )
    terms = (
        ch.join(F.broadcast(v0), F.expr("(shiftright(m0, c) & 1) = 0"))
        .join(F.broadcast(v1), F.expr("m1 = m0 + shiftleft(1, c)"))
        .select("c", (w24 * (F.col("vfp1") - F.col("vfp0"))).alias("t"))
    )
    return terms.groupBy("c").agg(
        F.round(
            F.sum("t").cast("double") / F.lit(24000000000.0), 6
        ).alias("shapley_value")
    ).select(
        F.when(F.col("c") == 0, "view")
        .when(F.col("c") == 1, "click")
        .when(F.col("c") == 2, "signup")
        .otherwise("error")
        .alias("channel"),
        "shapley_value",
    )


#: Markov-attribution state encoding shared by the Spark query and the
#: DuckDB oracle: 0=start, 1..4=channels (view/click/signup/error),
#: 5=conv, 6=null. 32 fixed-point iterations at 1e9 scale.
_MK_STATES = {"view": 1, "click": 2, "signup": 3, "error": 4}
_MK_ITERS = 32
_MK_FP = 1_000_000_000


def _markov_oracle() -> str:
    ch_case = " ".join(
        f"WHEN event_type = '{n}' THEN {i}" for n, i in _MK_STATES.items()
    )
    # 32 unrolled fixed-point power-iteration steps (DuckDB disallows
    # GROUP BY in a recursive CTE term; unrolling keeps each step a
    # plain aggregate — the iteration count is a compile-time constant
    # shared with the Spark side via _MK_ITERS)
    steps_sql = ",\n    ".join(
        f"""w{k} AS MATERIALIZED (
      SELECT w.rm,
        CASE WHEN t.s2 = w.rm THEN 6 ELSE t.s2 END AS st,
        CAST(sum(w.p * t.c // ct.tot) AS BIGINT) AS p
      FROM w{k - 1} w
      JOIN tt t ON t.s = w.st
      JOIN ctot ct ON ct.s = w.st
      WHERE w.st NOT IN (5, 6) AND w.st <> w.rm
      GROUP BY 1, 2
    )"""
        for k in range(1, _MK_ITERS + 1)
    )
    all_steps = "\n      UNION ALL ".join(
        f"SELECT rm, st, p FROM w{k}" for k in range(1, _MK_ITERS + 1)
    )
    return f"""
    WITH fp AS (
      SELECT user_id, min(ts) AS fts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touch AS MATERIALIZED (
      SELECT e.user_id, e.ts, e.event_id,
        CASE {ch_case} END AS st
      FROM events e LEFT JOIN fp USING (user_id)
      WHERE e.event_type <> 'purchase'
        AND (fp.fts IS NULL OR e.ts < fp.fts)
    ),
    path AS MATERIALIZED (
      SELECT user_id, st,
        lag(st, 1, 0) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rrn
      FROM touch
    ),
    conv AS MATERIALIZED (
      SELECT t.user_id,
        CASE WHEN fp.fts IS NOT NULL THEN 5 ELSE 6 END AS absorb,
        max(CASE WHEN rrn = 1 THEN st END) AS last_st
      FROM path t LEFT JOIN fp ON fp.user_id = t.user_id
      GROUP BY t.user_id, 2
    ),
    bare AS MATERIALIZED (
      SELECT f.user_id FROM fp f
      WHERE NOT EXISTS (SELECT 1 FROM touch t WHERE t.user_id = f.user_id)
    ),
    trans AS MATERIALIZED (
      SELECT prev AS s, st AS s2, CAST(count(*) AS BIGINT) AS c
      FROM path GROUP BY 1, 2
      UNION ALL
      SELECT last_st AS s, absorb AS s2, CAST(count(*) AS BIGINT) AS c
      FROM conv GROUP BY 1, 2
      UNION ALL
      SELECT 0 AS s, 5 AS s2, CAST(count(*) AS BIGINT) AS c
      FROM bare HAVING count(*) > 0
    ),
    tt AS MATERIALIZED (SELECT s, s2, CAST(sum(c) AS BIGINT) AS c FROM trans GROUP BY 1, 2),
    ctot AS MATERIALIZED (SELECT s, CAST(sum(c) AS BIGINT) AS tot FROM tt GROUP BY s),
    variants AS (SELECT unnest([-1, 1, 2, 3, 4]) AS rm),
    w0 AS MATERIALIZED (
      SELECT rm, 0 AS st, CAST({_MK_FP} AS BIGINT) AS p FROM variants
    ),
    {steps_sql},
    absorbed AS (
      SELECT rm, CAST(sum(p) AS BIGINT) AS conv_fp FROM (
      {all_steps}
      ) WHERE st = 5 GROUP BY rm
    ),
    base AS (SELECT conv_fp AS base_fp FROM absorbed WHERE rm = -1),
    re AS (
      SELECT v.rm,
        1.0 - CAST(coalesce(a.conv_fp, 0) AS DOUBLE)
          / CAST(base.base_fp AS DOUBLE) AS eff
      FROM variants v LEFT JOIN absorbed a ON a.rm = v.rm CROSS JOIN base
      WHERE v.rm <> -1
    ),
    tot_eff AS (SELECT sum(eff) AS te FROM re)
    SELECT CASE rm WHEN 1 THEN 'view' WHEN 2 THEN 'click'
                   WHEN 3 THEN 'signup' ELSE 'error' END AS channel,
      round(eff, 6) AS removal_effect,
      round(eff / te, 6) AS attribution_share
    FROM re, tot_eff
    """


@register("markov_removal_attribution", _markov_oracle())
def q_markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution — the OTHER standard
    data-driven attribution (Anderl et al.'s removal effect),
    complementing shapley_channel_attribution's coalition view with a
    SEQUENCE view: fit a first-order Markov chain over user journeys
    (start → channel touches before first purchase → conv/null), then
    each channel's credit is how much the chain's absorption
    probability into conv drops when that channel is removed
    (its inbound mass redirected to null), normalized into shares.

    Cross-engine exactness: transition counts are exact BIGINTs from
    one lag pass; absorption runs as a FIXED 32-step fixed-point power
    iteration where every step is integer arithmetic —
    p'(s') = Σ_s floor(p_fp(s)·c(s,s')/tot(s)) at 1e9 scale (terms
    floored BEFORE summing, so partial-sum order cannot matter) — in
    Spark as driver-side Python ints over the COLLECTED 7×7 count
    matrix (bounded-domain collect, the BPE-merge precedent: the
    row-scale work is the distributed journey/lag pass; the solve is
    O(states²·iters) scalar math), in DuckDB as a recursive CTE doing
    the IDENTICAL integer updates. The only doubles are the final
    removal-effect ratios, round-6.

    Scale shape: one events scan, per-user lag windows (bounded
    per-user rows), a (s, s') hash aggregate to ≤ 7² cells, then O(1)
    driver math — at 100 TB the cost is the scan + the user-keyed
    window exchange."""
    ev = load_table(spark, sf_dir, "events")
    st = F.create_map(
        *[x for n, i in _MK_STATES.items() for x in (F.lit(n), F.lit(i))]
    )[F.col("event_type")]
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
    )
    touch = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(F.col("fts").isNull() | (F.col("ts") < F.col("fts")))
        .select("user_id", "ts", "event_id", st.alias("st"),
                F.col("fts").isNotNull().alias("conv"))
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    path = touch.select(
        "user_id",
        "st",
        "conv",
        F.lag("st", 1, 0).over(wu).alias("prev"),
        F.row_number().over(wr).alias("rrn"),
    )
    steps = path.select(F.col("prev").alias("s"), F.col("st").alias("s2"))
    absorbs = path.filter(F.col("rrn") == 1).select(
        F.col("st").alias("s"),
        F.when(F.col("conv"), 5).otherwise(6).alias("s2"),
    )
    bare = (
        fp.join(
            touch.select("user_id").distinct(), "user_id", "left_anti"
        ).select(F.lit(0).alias("s"), F.lit(5).alias("s2"))
    )
    tt = (
        steps.unionByName(absorbs)
        .unionByName(bare)
        .groupBy("s", "s2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded-domain collect: ≤ 7×7 transition cells
    cells = {(r.s, r.s2): r.c for r in tt.collect()}
    tot = {}
    for (s, _), c in cells.items():
        tot[s] = tot.get(s, 0) + c

    def absorb_fp(removed: int) -> int:
        p = {0: _MK_FP}
        conv_fp = 0
        for _ in range(_MK_ITERS):
            nxt: dict[int, int] = {}
            for s, mass in p.items():
                if s in (5, 6) or s == removed or s not in tot:
                    continue
                for (a, b), c in cells.items():
                    if a != s:
                        continue
                    b2 = 6 if b == removed else b
                    nxt[b2] = nxt.get(b2, 0) + mass * c // tot[s]
            conv_fp += nxt.pop(5, 0)
            p = nxt
        return conv_fp

    base = absorb_fp(-1)
    effs = {
        name: 1.0 - absorb_fp(i) / base for name, i in _MK_STATES.items()
    }
    te = sum(effs.values())
    rows = [
        (name, round(eff, 6), round(eff / te, 6))
        for name, eff in effs.items()
    ]
    return spark.createDataFrame(
        rows, "channel string, removal_effect double, attribution_share double"
    )


@register(
    "heaps_law_vocab_growth",
    """
    WITH d0 AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    tri AS (
      SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS tok
      FROM d0
    ),
    md AS (SELECT CAST(max(doc_id) AS BIGINT) AS maxdoc FROM tri),
    grid AS (
      SELECT CAST(j AS BIGINT) AS j,
        CAST(maxdoc * j // 10 AS BIGINT) AS thr
      FROM (SELECT unnest(range(1, 11)) AS j), md
    ),
    firsts AS (
      SELECT tok, CAST(min(doc_id) AS BIGINT) AS fd FROM tri GROUP BY tok
    ),
    doccnt AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY doc_id
    ),
    cp AS (
      SELECT g.j,
        (SELECT CAST(sum(c) AS BIGINT) FROM doccnt WHERE doc_id <= g.thr)
          AS n_tokens,
        (SELECT CAST(count(*) AS BIGINT) FROM firsts WHERE fd <= g.thr)
          AS vocab
      FROM grid g
    ),
    lg AS (
      SELECT j, n_tokens, vocab,
        CAST(floor(1000000.0 * ln(CAST(n_tokens AS DOUBLE))) AS BIGINT)
          AS x_fp,
        CAST(floor(1000000.0 * ln(CAST(vocab AS DOUBLE))) AS BIGINT) AS y_fp
      FROM cp
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x_fp) AS BIGINT) AS sx, CAST(sum(y_fp) AS BIGINT) AS sy,
        CAST(sum(x_fp * y_fp) AS BIGINT) AS sxy,
        CAST(sum(x_fp * x_fp) AS BIGINT) AS sxx
      FROM lg
    ),
    fit AS (
      SELECT
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
        sx, sy, n
      FROM ols
    )
    SELECT lg.j, lg.n_tokens, lg.vocab,
      round(fit.beta, 6) AS heaps_beta,
      round(exp((CAST(fit.sy AS DOUBLE)
                 - fit.beta * CAST(fit.sx AS DOUBLE))
                / CAST(fit.n AS DOUBLE) / 1000000.0), 6) AS heaps_k
    FROM lg, fit
    """,
)
def q_heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit over the word-trigram vocabulary: V(N) = K·N^β,
    the vocabulary-GROWTH scaling law that pairs with
    zipf_slope_by_source (frequency decay) and good_turing_unseen_mass
    (unseen mass at the current N) to answer "how fast does new
    vocabulary keep arriving as the corpus grows" — the number that
    sizes tokenizer vocabularies and dedup fingerprint tables before a
    100 TB ingest. Growth curve sampled at 10 DOC-PREFIX checkpoints
    (vocab = trigrams whose FIRST document lies in the prefix; token
    count = trigram occurrences in the prefix) — prefix membership is
    a pure doc_id threshold, so no global token ordering or rank
    machinery is needed. Every checkpoint count is an exact BIGINT;
    the log-log OLS runs on FIXED-POINT logs (floor(1e6·ln) — exact
    integer sums, the repo discipline; ln on identical operands is
    engine-identical per the weighted_sample_wor precedent), and β/K
    assemble in one shared double tree, round-6.

    Scale shape: one trigram explode feeding two hash aggregates
    (first-doc per trigram — the dedup-fingerprint exchange — and
    per-doc counts), then all checkpoint/OLS work on broadcast
    10-row frames."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    d0 = docs.select("doc_id", w.alias("w")).filter(F.size("w") >= 3)
    tri = d0.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
            )
        ).alias("tok"),
    )
    md = tri.agg(F.max("doc_id").alias("maxdoc"))
    grid = (
        spark.range(1, 11)
        .select(F.col("id").alias("j"))
        .crossJoin(F.broadcast(md))
        .select("j", ((F.col("maxdoc") * F.col("j")) / 10).cast("bigint").alias("thr"))
    )
    firsts = tri.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    doccnt = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    vj = (
        firsts.join(F.broadcast(grid), F.col("fd") <= F.col("thr"))
        .groupBy("j")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    nj = (
        doccnt.join(F.broadcast(grid), F.col("doc_id") <= F.col("thr"))
        .groupBy("j")
        .agg(F.sum("c").alias("n_tokens"))
    )
    lg = (
        nj.join(F.broadcast(vj), "j")
        .select(
            "j",
            "n_tokens",
            "vocab",
            F.floor(
                F.lit(1000000.0) * F.log(F.col("n_tokens").cast("double"))
            )
            .cast("bigint")
            .alias("x_fp"),
            F.floor(
                F.lit(1000000.0) * F.log(F.col("vocab").cast("double"))
            )
            .cast("bigint")
            .alias("y_fp"),
        )
    )
    ols = lg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_fp").alias("sx"),
        F.sum("y_fp").alias("sy"),
        F.sum(F.col("x_fp") * F.col("y_fp")).alias("sxy"),
        F.sum(F.col("x_fp") * F.col("x_fp")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    beta = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    fit = ols.select(
        beta.alias("beta"), "sx", "sy", "n"
    )
    return lg.crossJoin(F.broadcast(fit)).select(
        "j",
        "n_tokens",
        "vocab",
        F.round(F.col("beta"), 6).alias("heaps_beta"),
        F.round(
            F.exp(
                (
                    F.col("sy").cast("double")
                    - F.col("beta") * F.col("sx").cast("double")
                )
                / F.col("n").cast("double")
                / F.lit(1000000.0)
            ),
            6,
        ).alias("heaps_k"),
    )


@register(
    "good_turing_unseen_mass",
    """
    WITH d0 AS (
      SELECT string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    toks AS (
      SELECT unnest(list_transform(range(1, len(w) - 1),
        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS tok
      FROM d0
    ),
    cnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY tok
    ),
    nr AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cnt
      WHERE r <= 5 GROUP BY r
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks),
    n1 AS (
      SELECT CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
        AS n1
      FROM nr
    ),
    grid AS (SELECT unnest(range(1, 5)) AS r)
    SELECT grid.r, coalesce(a.n_r, 0) AS n_r,
      coalesce(b.n_r, 0) AS n_r_plus1,
      round(CAST(grid.r + 1 AS DOUBLE) * CAST(coalesce(b.n_r, 0) AS DOUBLE)
            / nullif(CAST(coalesce(a.n_r, 0) AS DOUBLE), 0.0), 6) AS r_star,
      round(CAST(n1.n1 AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE), 6)
        AS p_unseen
    FROM grid LEFT JOIN nr a ON a.r = grid.r
    LEFT JOIN nr b ON b.r = grid.r + 1
    CROSS JOIN tot CROSS JOIN n1
    """,
)
def q_good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus word-TRIGRAM
    vocabulary: p_unseen = N₁/N (the total probability mass of
    trigrams never seen — what an n-gram LM / coverage model built on
    this corpus will miss on the next shard) and the adjusted counts
    r* = (r+1)·N_{r+1}/N_r for r = 1..4 (how much observed low counts
    overstate their true frequency). THE coverage-planning number
    vocab_coverage_topk's head-coverage view doesn't give. Trigrams,
    not unigrams: the synthetic corpus has a closed 31-word vocabulary
    (min unigram count 26 — no frequency tail at all), while its
    trigram space has the genuine power-law tail Good-Turing exists
    for. Every input (N, N_r) is an exact BIGINT from two hash
    aggregates; the ratios are single shared double expressions,
    round-6; empty N_r cells yield NULL r* via nullif in both engines.

    Scale shape: one trigram explode → (gram) hash aggregate (the
    top_bigrams exchange), then a count-of-counts aggregate on the
    BOUNDED r≤5 domain and a 4-row broadcast grid assembly."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    d0 = docs.select(w.alias("w")).filter(F.size("w") >= 3)
    toks = d0.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 3), "
                "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
            )
        ).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    nr = (
        cnt.filter(F.col("r") <= 5)
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    tot = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    n1 = nr.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        ).alias("n1")
    )
    grid = spark.range(1, 5).select(F.col("id").alias("r"))
    a = nr.select(F.col("r").alias("ra"), F.col("n_r").alias("na"))
    b = nr.select(F.col("r").alias("rb"), F.col("n_r").alias("nb"))
    return (
        grid.join(F.broadcast(a), F.col("r") == F.col("ra"), "left")
        .join(F.broadcast(b), F.col("r") + 1 == F.col("rb"), "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            F.coalesce(F.col("na"), F.lit(0)).alias("n_r"),
            F.coalesce(F.col("nb"), F.lit(0)).alias("n_r_plus1"),
            F.round(
                (F.col("r") + 1).cast("double")
                * F.coalesce(F.col("nb"), F.lit(0)).cast("double")
                / F.nullif(
                    F.coalesce(F.col("na"), F.lit(0)).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("r_star"),
            F.round(
                F.col("n1").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("p_unseen"),
        )
    )


@register(
    "rbo_bm25_vs_lm",
    """
    WITH tok AS (
      SELECT doc_id, w FROM documents,
        unnest(string_split(text, ' ')) AS t(w) WHERE w <> ''
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, w
    ),
    dlen AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len) AS DOUBLE) / count(*) AS avg,
             CAST(sum(len) AS BIGINT) AS ctot
      FROM dlen
    ),
    top3 AS (
      SELECT w, cf FROM (
        SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY w
        ORDER BY cf DESC, w LIMIT 3)
    ),
    dfq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df
      FROM tf JOIN top3 USING (w) GROUP BY w
    ),
    terms AS (
      SELECT dfq.w, top3.cf,
        ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
      FROM dfq JOIN top3 USING (w) CROSS JOIN stats
    ),
    bm AS (
      SELECT tf.doc_id,
        round(sum(idf * (tf * 2.2)
            / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg))), 6) AS s
      FROM tf JOIN terms USING (w) JOIN dlen USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    lm AS (
      SELECT dlen.doc_id,
        round(sum(ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
                      + 1000.0 * CAST(terms.cf AS DOUBLE)
                        / CAST(stats.ctot AS DOUBLE))
                     / (CAST(dlen.len AS DOUBLE) + 1000.0))), 6) AS s
      FROM dlen CROSS JOIN terms CROSS JOIN stats
      LEFT JOIN tf ON tf.doc_id = dlen.doc_id AND tf.w = terms.w
      GROUP BY dlen.doc_id
    ),
    ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM bm QUALIFY r <= 50
    ),
    rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM lm QUALIFY r <= 50
    ),
    m AS (
      SELECT coalesce(ra.r, 999999) AS r_a, coalesce(rb.r, 999999) AS r_b
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    ),
    depth AS (SELECT unnest(range(1, 51)) AS dp),
    ov AS (
      SELECT dp, CAST(sum(CASE WHEN r_a <= dp AND r_b <= dp
                          THEN 1 ELSE 0 END) AS BIGINT) AS inter
      FROM depth, m GROUP BY dp
    )
    SELECT CAST(50 AS INT) AS k,
      CAST(max(CASE WHEN dp = 50 THEN inter END) AS BIGINT) AS overlap_at_k,
      round(0.1 * sum(power(0.9, dp - 1) * inter / dp), 6) AS rbo
    FROM ov
    """,
)
def q_rbo_bm25_vs_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking agreement between the two lexical retrieval stacks —
    BM25 (bm25_topk's scorer: k1=1.2, b=0.75, Lucene idf) vs the
    Dirichlet query-likelihood LM (dirichlet_lm_topk's scorer, μ=1000)
    — over the SAME in-plan query (top-3 collection-frequency terms),
    measured as truncated RBO (p=0.9, depth 50). The ranker-comparison
    readout a retrieval stack checks before fusing (rrf_fusion_topk):
    high RBO = the fusion adds little; low = complementary signals.
    Both rankings cut on their ROUNDED scores with doc_id tie-breaks
    (exact-integer inputs → identical doubles → identical ranked
    lists); the RBO weighted sum spans 50 identical per-term floats.

    Scale shape: one token explode feeding the tf/dlen/stats hash
    aggs shared by BOTH scorers; per-scorer cost is a broadcast 3-term
    join; two TakeOrdered top-50s (never a corpus sort); a 50-depth
    broadcast grid; 1-row reduce."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dlen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dlen.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("len").cast("double") / F.count(F.lit(1))).alias("avg"),
        F.sum("len").alias("ctot"),
    )
    top3 = (
        tf.groupBy("w")
        .agg(F.sum("tf").alias("cf"))
        .orderBy(F.col("cf").desc(), F.col("w"))
        .limit(3)
    )
    dfq = (
        tf.join(F.broadcast(top3.select("w")), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    terms = (
        dfq.join(F.broadcast(top3), "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            "cf",
            F.log(
                F.lit(1.0)
                + (F.col("n").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    bm = (
        tf.join(F.broadcast(terms), "w")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * (F.col("tf") * F.lit(2.2))
                    / (
                        F.col("tf")
                        + F.lit(1.2)
                        * (
                            F.lit(1.0)
                            - F.lit(0.75)
                            + F.lit(0.75) * F.col("len") / F.col("avg")
                        )
                    )
                ),
                6,
            ).alias("s")
        )
    )
    lm = (
        dlen.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(stats))
        .join(tf, ["doc_id", "w"], "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        (
                            F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                            + F.lit(1000.0)
                            * F.col("cf").cast("double")
                            / F.col("ctot").cast("double")
                        )
                        / (F.col("len").cast("double") + F.lit(1000.0))
                    )
                ),
                6,
            ).alias("s")
        )
    )

    def top50(scored):
        t = scored.orderBy(F.desc("s"), "doc_id").limit(50)
        w = Window.orderBy(F.desc("s"), "doc_id")
        return t.select("doc_id", F.row_number().over(w).alias("r"))

    ra = top50(bm).select("doc_id", F.col("r").alias("r_a"))
    rb = top50(lm).select("doc_id", F.col("r").alias("r_b"))
    m = ra.join(rb, "doc_id", "full_outer").select(
        F.coalesce(F.col("r_a"), F.lit(999999)).alias("r_a"),
        F.coalesce(F.col("r_b"), F.lit(999999)).alias("r_b"),
    )
    depth = spark.range(1, 51).select(F.col("id").cast("int").alias("dp"))
    ov = (
        F.broadcast(depth)
        .crossJoin(m)
        .groupBy("dp")
        .agg(
            F.sum(
                F.when(
                    (F.col("r_a") <= F.col("dp"))
                    & (F.col("r_b") <= F.col("dp")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("inter")
        )
    )
    return ov.agg(
        F.lit(50).cast("int").alias("k"),
        F.max(F.when(F.col("dp") == 50, F.col("inter")))
        .cast("bigint")
        .alias("overlap_at_k"),
        F.round(
            F.lit(0.1)
            * F.sum(
                F.pow(F.lit(0.9), F.col("dp") - 1)
                * F.col("inter")
                / F.col("dp")
            ),
            6,
        ).alias("rbo"),
    )


@register(
    "friedman_event_counts",
    """
    WITH c AS (
      SELECT date_trunc('day', ts) AS day, event_type,
        CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, t.event_type
      FROM (SELECT DISTINCT day FROM c) d
      CROSS JOIN (SELECT DISTINCT event_type FROM c) t
    ),
    z AS (
      SELECT g.day, g.event_type, coalesce(c.cnt, 0) AS cnt
      FROM grid g LEFT JOIN c ON c.day = g.day
        AND c.event_type = g.event_type
    ),
    tv AS (
      SELECT day, cnt, CAST(count(*) AS BIGINT) AS t FROM z GROUP BY 1, 2
    ),
    cv AS (
      SELECT day, cnt, t,
        sum(t) OVER (PARTITION BY day ORDER BY cnt) - t AS below
      FROM tv
    ),
    r2 AS (
      SELECT z.event_type,
        CAST(sum(2 * cv.below + cv.t + 1) AS BIGINT) AS r2j
      FROM z JOIN cv ON cv.day = z.day AND cv.cnt = z.cnt
      GROUP BY z.event_type
    ),
    dims AS (
      SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
        CAST(count(DISTINCT event_type) AS BIGINT) AS k
      FROM z
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM tv
    ),
    agg AS (
      SELECT max(dims.n) AS n, max(dims.k) AS k,
        sum(CAST(r2j AS DECIMAL(38, 0)) * r2j) AS sr2,
        max(ties.tie3) AS tie3
      FROM r2, dims, ties
    )
    SELECT k, n,
      round(3.0 * CAST(sr2 AS DOUBLE)
              / (CAST(n AS DOUBLE) * k * (k + 1))
            - 3.0 * n * (k + 1), 6) AS q,
      round((3.0 * CAST(sr2 AS DOUBLE)
               / (CAST(n AS DOUBLE) * k * (k + 1))
             - 3.0 * n * (k + 1))
            / (1.0 - CAST(tie3 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * k * (k * k - 1))), 6) AS q_adj
    FROM agg
    """,
)
def q_friedman_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test on daily event-type volumes: blocks = days,
    treatments = the k event types, measure = events per (day, type)
    (zero-filled so every block ranks all k treatments). The
    repeated-measures counterpart of kruskal_wallis_value_by_type —
    Kruskal asks "do the groups differ overall", Friedman removes the
    between-day volume effect by ranking WITHIN each day, the right
    test when days differ wildly in traffic. Q = 12/(nk(k+1))·ΣR_j²
    − 3n(k+1) with the Σ(t³−t) tie correction.

    Exactness: counts are integers, so within-day average ranks use
    the doubled-rank identity 2r = 2·below + t + 1 (exact BIGINTs,
    the kruskal discipline); ΣR2_j² accumulates in DECIMAL(38,0);
    doubles appear only in the 1-row final assembly, round-6 gated.

    Scale shape: one (day, type) hash agg over the corpus, zero-fill
    via a broadcast type list, per-day windows over ≤k rows each
    (partitioned by day — no global window), k-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    days = c.select("day").distinct()
    types = c.select("event_type").distinct()
    z = (
        days.crossJoin(F.broadcast(types))
        .join(c, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
    )
    tv = z.groupBy("day", "cnt").agg(F.count(F.lit(1)).alias("t"))
    wd = Window.partitionBy("day").orderBy("cnt")
    cv = tv.withColumn("below", F.sum("t").over(wd) - F.col("t"))
    r2 = (
        z.join(cv, ["day", "cnt"])
        .groupBy("event_type")
        .agg(
            F.sum(2 * F.col("below") + F.col("t") + 1)
            .cast("bigint")
            .alias("r2j")
        )
    )
    dims = z.agg(
        F.countDistinct("day").alias("n"),
        F.countDistinct("event_type").alias("k"),
    )
    ties = tv.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3")
    )
    agg = (
        r2.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(ties))
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("k"),
            F.sum(F.col("r2j").cast("decimal(38,0)") * F.col("r2j")).alias(
                "sr2"
            ),
            F.max("tie3").alias("tie3"),
        )
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    q = (
        F.lit(3.0)
        * F.col("sr2").cast("double")
        / (nd * kd * (kd + 1))
        - F.lit(3.0) * nd * (kd + 1)
    )
    corr = F.lit(1.0) - F.col("tie3").cast("double") / (
        nd * kd * (kd * kd - 1)
    )
    return agg.select(
        "k", "n", F.round(q, 6).alias("q"), F.round(q / corr, 6).alias("q_adj")
    )


@register(
    "sprt_purchase_decision",
    """
    WITH inc AS (
      SELECT user_id, ts, event_id,
        CASE WHEN event_type = 'purchase'
             THEN CAST(510825623 AS BIGINT)
             ELSE CAST(-125163143 AS BIGINT) END AS d
      FROM events
    ),
    walk AS (
      SELECT user_id,
        sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum,
        CAST(row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS step
      FROM inc
    ),
    crossed AS (
      SELECT user_id,
        min(step) AS cross_step,
        arg_min(CASE WHEN cum >= 2944438979 THEN 'h1' ELSE 'h0' END, step)
          AS dec
      FROM walk
      WHERE cum >= 2944438979 OR cum <= -2944438979
      GROUP BY user_id
    ),
    allu AS (SELECT DISTINCT user_id FROM inc)
    SELECT coalesce(c.dec, 'open') AS decision,
      CAST(count(*) AS BIGINT) AS n_users,
      CAST(min(c.cross_step) AS BIGINT) AS min_cross_step,
      round(avg(CAST(c.cross_step AS DOUBLE)), 6) AS avg_cross_step
    FROM allu a LEFT JOIN crossed c ON c.user_id = a.user_id
    GROUP BY 1
    """,
)
def q_sprt_purchase_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per user stream:
    H0 purchase-rate p0=0.15 vs H1 p1=0.25, α=β=0.05. Each event adds
    the log-likelihood-ratio increment (ln(p1/p0) on purchase, else
    ln((1−p1)/(1−p0))); the walk stops at the first crossing of
    ±ln(19). The SEQUENTIAL counterpart of two_proportion_ztest —
    fixed-horizon tests need n chosen in advance, SPRT reads each
    user's stream once and stops optimally (Wald-Wolfowitz), which is
    exactly the early-exit shape a 100 TB quality gate wants. Reports
    users by terminal decision with first-crossing step stats.

    Exactness: the three LLR constants are PRECOMPUTED fixed-point
    integer literals (floor(1e9·ln), identical in both engines — no
    runtime transcendentals), so every cumulative sum and the
    boundary compare are exact BIGINT arithmetic; the only double is
    the final avg(step), round-6 gated.

    Scale shape: the walk is a per-user window (partitioned cumsum —
    no global window); crossings reduce per user; one k≤3-row final
    group. At 100 TB the stream is naturally user-partitioned and the
    walk is the streaming stateful twin's batch form."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(510825623))
        .otherwise(F.lit(-125163143))
        .cast("bigint")
        .alias("d"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    walk = inc.select(
        "user_id",
        F.sum("d").over(w).alias("cum"),
        F.row_number().over(w).cast("bigint").alias("step"),
    )
    crossed = (
        walk.filter(
            (F.col("cum") >= 2944438979) | (F.col("cum") <= -2944438979)
        )
        .groupBy("user_id")
        .agg(
            F.min("step").alias("cross_step"),
            F.min_by(
                F.when(F.col("cum") >= 2944438979, F.lit("h1")).otherwise(
                    F.lit("h0")
                ),
                "step",
            ).alias("dec"),
        )
    )
    allu = inc.select("user_id").distinct()
    return (
        allu.join(crossed, "user_id", "left")
        .groupBy(F.coalesce(F.col("dec"), F.lit("open")).alias("decision"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("cross_step").cast("bigint").alias("min_cross_step"),
            F.round(F.avg(F.col("cross_step").cast("double")), 6).alias(
                "avg_cross_step"
            ),
        )
    )


@register(
    "cramers_v_type_dow",
    """
    WITH e AS (
      SELECT event_type,
        (CAST(floor((epoch_ns(ts) / 1000) / 86400000000) AS BIGINT) % 7)
          AS dow
      FROM events
    ),
    o AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
      FROM e GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
    nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
    chi AS (
      SELECT min(nn.n) AS n,
        CAST(count(DISTINCT o.event_type) AS BIGINT) AS r_k,
        CAST(count(DISTINCT o.dow) AS BIGINT) AS c_k,
        CAST(sum(CAST(o.o AS HUGEINT) * o.o * nn.n * 1000000000
                 // (CAST(rt.r AS HUGEINT) * ct.c)) AS BIGINT) AS sfp
      FROM o JOIN rt USING (event_type) JOIN ct USING (dow), nn
    )
    SELECT n, r_k, c_k,
      round(CAST(sfp AS DOUBLE) / 1e9 - n, 6) AS chi2,
      round(sqrt((CAST(sfp AS DOUBLE) / 1e9 - n)
                 / (n * (CASE WHEN r_k < c_k THEN r_k ELSE c_k END - 1))),
            6) AS cramers_v
    FROM chi
    """,
)
def q_cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between event type and day-of-week — the normalized
    EFFECT SIZE companion to chi_square_independence's test statistic
    (χ² grows with n even for trivial association; V ∈ [0,1] is
    comparable across tables, the quantity a feature-selection pass
    actually thresholds). Uses χ² = n·(Σ o²/(r·c) − 1) so expected
    counts never materialize. Day-of-week is the calendar-free
    day-index mod 7 (floor(epoch_µs/86.4e9) % 7) — the same partition
    of rows in both engines without touching dow conventions.

    Exactness: Σ o²·n/(r·c) accumulates ×1e9 with per-term exact
    integer FLOOR division (Spark DECIMAL(38,0) `div` ↔ DuckDB
    HUGEINT `//`, both exact integral quotients — order-independent
    BIGINT sums), so the value is bit-identical before the single
    double assembly; round-6 on χ² and V.

    Scale shape: one (type, dow) hash agg over the corpus, then all
    work on ≤ r_k·c_k cells; marginals broadcast-join back to cells."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.floor(F.unix_micros("ts") / F.lit(86400000000)) % 7
        ).alias("dow"),
    )
    o = e.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    rt = o.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = o.groupBy("dow").agg(F.sum("o").alias("c"))
    nn = o.agg(F.sum("o").alias("n"))
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(nn))
    )
    chi = cells.agg(
        F.max("n").alias("n"),
        F.countDistinct("event_type").alias("r_k"),
        F.countDistinct("dow").alias("c_k"),
        F.sum(
            F.expr(
                "(CAST(o AS DECIMAL(38,0)) * o * n * 1000000000) div "
                "(CAST(r AS DECIMAL(38,0)) * c)"
            )
        ).alias("sfp"),
    )
    chi2 = F.col("sfp").cast("double") / F.lit(1e9) - F.col("n")
    mink = F.when(F.col("r_k") < F.col("c_k"), F.col("r_k")).otherwise(
        F.col("c_k")
    )
    return chi.select(
        "n",
        "r_k",
        "c_k",
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.col("n") * (mink - 1))), 6).alias(
            "cramers_v"
        ),
    )


#: BH step-up z-thresholds for m=5 two-sided tests at α=0.05:
#: thr_k = Φ⁻¹(1 − k·α/(2m)), precomputed (statistics.NormalDist) so
#: NEITHER engine evaluates an inverse normal at runtime. p_(k) ≤ kα/m
#: ⟺ |z|_(k) ≥ thr_k — BH on p-values without ever computing one.
_BH_THRESHOLDS = (
    (1, 2.575829304),
    (2, 2.326347874),
    (3, 2.170090378),
    (4, 2.053748911),
    (5, 1.959963985),
)

_BH_THR_SQL = "VALUES " + ", ".join(f"({k}, {t})" for k, t in _BH_THRESHOLDS)


@register(
    "bh_fdr_high_value_rate",
    f"""
    WITH e AS (
      SELECT event_type,
        CASE WHEN value > 50 THEN 1 ELSE 0 END AS hi
      FROM events WHERE value IS NOT NULL
    ),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(hi) AS BIGINT) AS x
      FROM e GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(x) AS BIGINT) AS xt
      FROM per
    ),
    z AS (
      SELECT event_type, n, x,
        (CAST(x AS DOUBLE) / n
         - CAST(tot.xt - x AS DOUBLE) / (tot.nt - n))
        / sqrt((CAST(tot.xt AS DOUBLE) / tot.nt)
               * (1.0 - CAST(tot.xt AS DOUBLE) / tot.nt)
               * (1.0 / n + 1.0 / (tot.nt - n))) AS zval
      FROM per, tot
    ),
    ranked AS (
      SELECT event_type, n, x, zval,
        CAST(row_number() OVER (
          ORDER BY abs(zval) DESC, event_type ASC) AS BIGINT) AS p_rank
      FROM z
    ),
    thr(k, thr) AS ({_BH_THR_SQL}),
    cutoff AS (
      SELECT coalesce(max(r.p_rank), 0) AS kmax
      FROM ranked r JOIN thr ON thr.k = r.p_rank
      WHERE abs(r.zval) >= thr.thr
    )
    SELECT r.event_type, r.n, r.x, round(r.zval, 6) AS z, r.p_rank,
      r.p_rank <= cutoff.kmax AS rejected
    FROM ranked r, cutoff
    """,
)
def q_bh_fdr_high_value_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over the per-type
    high-value-rate tests: each event type's rate of value>50 events
    is two-proportion-z tested against all OTHER types pooled, then
    the FIVE simultaneous tests are BH step-up corrected at α=0.05 —
    the multiple-testing discipline every per-segment test family in
    this registry (welch/mannwhitney/two_proportion/…) needs before
    anyone acts on its smallest p-value.

    Transcendental-free: BH compares p_(k) ≤ kα/m, which for
    two-sided z-tests is |z|_(k) ≥ Φ⁻¹(1−kα/2m) — the five inverse-
    normal thresholds are PRECOMPUTED literals shared by both engines
    (_BH_THRESHOLDS), and z itself is one shared arithmetic tree over
    exact BIGINT counts (+,−,×,÷,sqrt are all IEEE correctly-rounded,
    so the doubles are bit-identical cross-engine — no erf anywhere).
    Step-up: reject ranks 1..kmax where kmax is the LARGEST k passing,
    exactly the BH rule (not step-down).

    Scale shape: one hash agg over the corpus; everything after is a
    k=5-row frame (broadcast scalar total, k-row window, k-row
    threshold join)."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("nt"), F.sum("x").alias("xt")
    )
    z = per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "x",
        (
            (
                F.col("x").cast("double") / F.col("n")
                - (F.col("xt") - F.col("x")).cast("double")
                / (F.col("nt") - F.col("n"))
            )
            / F.sqrt(
                (F.col("xt").cast("double") / F.col("nt"))
                * (
                    F.lit(1.0)
                    - F.col("xt").cast("double") / F.col("nt")
                )
                * (
                    F.lit(1.0) / F.col("n")
                    + F.lit(1.0) / (F.col("nt") - F.col("n"))
                )
            )
        ).alias("zval"),
    )
    w = Window.orderBy(F.abs(F.col("zval")).desc(), F.col("event_type").asc())
    ranked = z.withColumn("p_rank", F.row_number().over(w).cast("bigint"))
    thr = spark.createDataFrame(
        list(_BH_THRESHOLDS), "k bigint, thr double"
    )
    cutoff = (
        ranked.join(F.broadcast(thr), ranked["p_rank"] == thr["k"])
        .filter(F.abs(F.col("zval")) >= F.col("thr"))
        .agg(F.coalesce(F.max("p_rank"), F.lit(0)).alias("kmax"))
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        "n",
        "x",
        F.round("zval", 6).alias("z"),
        "p_rank",
        (F.col("p_rank") <= F.col("kmax")).alias("rejected"),
    )


@register(
    "stratified_ate_urgent_orders",
    """
    WITH o AS (
      SELECT c.c_nationkey AS stratum,
        CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
        CAST(o.o_totalprice AS DECIMAL(38, 6)) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    s AS (
      SELECT stratum,
        CAST(count(*) AS BIGINT) AS n_s,
        CAST(sum(tr) AS BIGINT) AS n_t,
        CAST(sum(CASE WHEN tr = 1 THEN y END) AS DECIMAL(38, 6)) AS y_t,
        CAST(sum(CASE WHEN tr = 0 THEN y END) AS DECIMAL(38, 6)) AS y_c
      FROM o GROUP BY stratum
    ),
    ok AS (
      SELECT * FROM s WHERE n_t > 0 AND n_s - n_t > 0
    ),
    nn AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM ok)
    SELECT
      CAST(count(*) AS BIGINT) AS n_strata,
      CAST(sum(n_t) AS BIGINT) AS n_treated,
      CAST(sum(n_s - n_t) AS BIGINT) AS n_control,
      round(sum((CAST(n_s AS DOUBLE) / nn.n)
                * (CAST(y_t AS DOUBLE) / n_t
                   - CAST(y_c AS DOUBLE) / (n_s - n_t))), 4) AS ate,
      round(sum(CAST(y_t AS DOUBLE)) / sum(n_t)
            - sum(CAST(y_c AS DOUBLE)) / sum(n_s - n_t), 4) AS naive_diff
    FROM ok, nn
    """,
)
def q_stratified_ate_urgent_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Post-stratification average treatment effect: the effect of
    1-URGENT priority on order value, stratified by customer nation —
    ATE = Σ_s (n_s/N)(ȳ_treated,s − ȳ_control,s) over strata with both
    arms, next to the naive pooled difference it corrects. THE
    confounding-adjustment baseline of the causal family (CUPED
    reduces variance, diff-in-diff removes time trends; this removes
    composition bias when treatment assignment varies by stratum).

    Exactness: per-stratum sums accumulate in DECIMAL(38,6) (exact,
    order-free — o_totalprice is decimal-born); each stratum
    contributes one shared double expression; the cross-stratum sum
    is ≤25 doubles of magnitude ~1e3 (ulp noise ~1e-12, round-4
    gated ~1e8 safety factor).

    Scale shape: one corpus join (customer dim broadcasts), one
    (stratum) hash agg, then a ≤25-row frame with a broadcast scalar
    N; final 1-row reduce."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_nationkey").alias("stratum"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("y"),
    )
    s = o.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("tr").cast("bigint").alias("n_t"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")))
        .cast("decimal(38,6)")
        .alias("y_t"),
        F.sum(F.when(F.col("tr") == 0, F.col("y")))
        .cast("decimal(38,6)")
        .alias("y_c"),
    )
    ok = s.filter((F.col("n_t") > 0) & (F.col("n_s") - F.col("n_t") > 0))
    nn = ok.agg(F.sum("n_s").alias("n"))
    return ok.crossJoin(F.broadcast(nn)).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("n_t").cast("bigint").alias("n_treated"),
        F.sum(F.col("n_s") - F.col("n_t")).cast("bigint").alias("n_control"),
        F.round(
            F.sum(
                (F.col("n_s").cast("double") / F.col("n"))
                * (
                    F.col("y_t").cast("double") / F.col("n_t")
                    - F.col("y_c").cast("double")
                    / (F.col("n_s") - F.col("n_t"))
                )
            ),
            4,
        ).alias("ate"),
        F.round(
            F.sum(F.col("y_t").cast("double")) / F.sum("n_t")
            - F.sum(F.col("y_c").cast("double"))
            / F.sum(F.col("n_s") - F.col("n_t")),
            4,
        ).alias("naive_diff"),
    )


@register(
    "log_rank_conversion_survival",
    """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
    ),
    pur AS (
      SELECT * FROM e WHERE event_type = 'purchase' AND cv IS NOT NULL
    ),
    gv AS (SELECT cv, count(*) AS t FROM pur GROUP BY cv),
    cum AS (SELECT cv, t, sum(t) OVER (ORDER BY cv) AS c FROM gv),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pur),
    cut AS (
      SELECT min(cv) AS cut FROM cum, np WHERE c >= (9 * np.n + 9) // 10
    ),
    conv AS (
      SELECT user_id, min(us) AS tc
      FROM pur, cut WHERE pur.cv > cut.cut GROUP BY user_id
    ),
    peru AS (SELECT user_id, min(us) AS t0, max(us) AS tl FROM e GROUP BY 1),
    surv AS (
      SELECT peru.user_id % 2 AS g,
        (COALESCE(conv.tc, peru.tl) - peru.t0) // 86400000000 AS dur,
        CASE WHEN conv.tc IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM peru LEFT JOIN conv ON peru.user_id = conv.user_id
    ),
    cnt AS (
      SELECT dur,
        CAST(sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
      FROM surv GROUP BY dur
    ),
    ar AS (
      SELECT d.dur, d.d0, d.d1,
        CAST(sum(c.c1) AS BIGINT) AS n1, CAST(sum(c.c0) AS BIGINT) AS n0
      FROM cnt d JOIN cnt c ON c.dur >= d.dur
      WHERE d.d0 + d.d1 > 0
      GROUP BY 1, 2, 3
    ),
    terms AS (
      SELECT d1,
        CAST(d0 + d1 AS HUGEINT) * n1 * 1000000000000 // (n0 + n1) AS e1fp,
        CASE WHEN n0 + n1 > 1 THEN
          CAST(d0 + d1 AS HUGEINT) * n1 * n0 * (n0 + n1 - d0 - d1)
            * 1000000000000
            // (CAST(n0 + n1 AS HUGEINT) * (n0 + n1) * (n0 + n1 - 1))
        ELSE 0 END AS vfp
      FROM ar
    ),
    meta AS (
      SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_users_g1,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_g0,
        CAST(sum(ev) AS BIGINT) AS n_conv
      FROM surv
    ),
    s AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
        CAST(CAST(sum(e1fp) AS VARCHAR) AS DOUBLE) / 1e12 AS e1,
        CAST(CAST(sum(vfp) AS VARCHAR) AS DOUBLE) / 1e12 AS v1
      FROM terms
    )
    SELECT meta.n_users_g1, meta.n_users_g0, meta.n_conv, s.o1,
      round(s.e1, 6) AS e1,
      round(s.v1, 6) AS var1,
      round((s.o1 - s.e1) / sqrt(s.v1), 6) AS z,
      round((s.o1 - s.e1) * (s.o1 - s.e1) / s.v1, 6) AS chi2
    FROM s, meta
    """,
)
def q_log_rank_conversion_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-rank test comparing two user cohorts' time-to-conversion
    survival curves — the HYPOTHESIS-TEST companion to
    `kaplan_meier_retention` (which draws a curve but cannot say
    whether two cohorts differ). Entry = a user's first event;
    conversion = first purchase whose value exceeds the in-query exact
    90th-percentile purchase cut (an order statistic, so the event
    definition is scale-invariant — an absolute threshold would go
    vacuous as value ranges grow with SF, the r4 lesson); users who
    never convert are right-CENSORED at their last observed event.
    Cohorts split on user_id parity. At each death time d:
    O1 = observed conversions in cohort 1, E1 = d·n1/n under H0,
    V = d·(n1/n)(n0/n)(n−d)/(n−1); z = (ΣO1−ΣE1)/√ΣV.

    Exactness: counts and at-risk sets are exact BIGINTs; per-term
    E and V accumulate ×1e12 with exact integer floor division (Spark
    DECIMAL(38,0) `div` ↔ DuckDB HUGEINT `//`), so the sums are
    order-independent integers; decimal sums cross to double via
    STRING (the r4 decimal→double two-rounding trap). The final z/χ²
    assembly is one identical IEEE expression tree.

    Scale shape: one per-user hash agg over the corpus (shuffle on
    user_id), then everything lives on ≤ |distinct days| rows — the
    at-risk table comes from a broadcast non-equi self-join of the
    tiny per-day count frame (bounded by the calendar, not the data);
    no windows over unaggregated rows."""
    return log_rank_from_surv(conversion_surv(spark, sf_dir))


def conversion_surv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (g, dur, ev) time-to-conversion survival frame shared by
    the log-rank test and the Nelson-Aalen estimator: cohort = user_id
    parity, conversion = first purchase above the in-query exact 90th-
    percentile purchase-value cut, right-censored at last observed
    event; durations in whole days."""
    from ..operators.ranking import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cv"),
    )
    pur = e.filter(
        (F.col("event_type") == "purchase") & F.col("cv").isNotNull()
    )
    gv = pur.groupBy("cv").agg(F.count(F.lit(1)).alias("t"))
    cum = global_running_sum(gv, ["cv"], "t", "c")
    np_ = pur.agg(F.count(F.lit(1)).alias("n"))
    cut = (
        cum.crossJoin(F.broadcast(np_))
        .filter(F.col("c") >= F.expr("(9 * n + 9) div 10"))
        .agg(F.min("cv").alias("cut"))
    )
    conv = (
        pur.crossJoin(F.broadcast(cut))
        .filter(F.col("cv") > F.col("cut"))
        .groupBy("user_id")
        .agg(F.min("us").alias("tc"))
    )
    peru = e.groupBy("user_id").agg(
        F.min("us").alias("t0"), F.max("us").alias("tl")
    )
    return peru.join(conv, "user_id", "left").select(
        (F.col("user_id") % 2).alias("g"),
        F.expr(
            "(coalesce(tc, tl) - t0) div 86400000000"
        ).alias("dur"),
        F.when(F.col("tc").isNotNull(), 1).otherwise(0).alias("ev"),
    )


def log_rank_from_surv(surv: DataFrame) -> DataFrame:
    """Log-rank assembly over a (g, dur, ev) survival frame — shared
    by the batch query and the streaming twin test so both run the
    IDENTICAL Column tree (the digest_term precedent): per-duration
    death/at-risk counts via the broadcast non-equi self-join, exact
    fixed-point E/V terms, one final z/chi-square row."""
    cnt = surv.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 1, F.col("ev")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 0, F.col("ev")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c0"),
    )
    d = cnt.filter(F.col("d0") + F.col("d1") > 0).alias("d")
    c = cnt.alias("c")
    ar = (
        d.join(F.broadcast(c), F.col("c.dur") >= F.col("d.dur"))
        .groupBy(
            F.col("d.dur").alias("dur"),
            F.col("d.d0").alias("d0"),
            F.col("d.d1").alias("d1"),
        )
        .agg(
            F.sum(F.col("c.c1")).alias("n1"),
            F.sum(F.col("c.c0")).alias("n0"),
        )
    )
    terms = ar.select(
        "d1",
        F.expr(
            "(CAST(d0 + d1 AS DECIMAL(38,0)) * n1 * 1000000000000)"
            " div (n0 + n1)"
        ).alias("e1fp"),
        F.expr(
            "CASE WHEN n0 + n1 > 1 THEN"
            " (CAST(d0 + d1 AS DECIMAL(38,0)) * n1 * n0"
            "  * (n0 + n1 - d0 - d1) * 1000000000000)"
            " div (CAST(n0 + n1 AS DECIMAL(38,0)) * (n0 + n1)"
            "      * (n0 + n1 - 1))"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("vfp"),
    )
    meta = surv.agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n_users_g1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n_users_g0"),
        F.sum("ev").alias("n_conv"),
    )
    s = terms.agg(
        F.sum("d1").alias("o1"),
        (
            F.sum(F.col("e1fp").cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
            / F.lit(1e12)
        ).alias("e1"),
        (
            F.sum(F.col("vfp").cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
            / F.lit(1e12)
        ).alias("v1"),
    )
    zc = (F.col("o1") - F.col("e1")) / F.sqrt(F.col("v1"))
    return s.crossJoin(F.broadcast(meta)).select(
        "n_users_g1",
        "n_users_g0",
        "n_conv",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("v1", 6).alias("var1"),
        F.round(zc, 6).alias("z"),
        F.round(
            (F.col("o1") - F.col("e1"))
            * (F.col("o1") - F.col("e1"))
            / F.col("v1"),
            6,
        ).alias("chi2"),
    )


@register(
    "brown_forsythe_value_by_type",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    gv AS (SELECT event_type, cv, count(*) AS t FROM e GROUP BY 1, 2),
    c AS (
      SELECT event_type, cv, t,
        sum(t) OVER (PARTITION BY event_type ORDER BY cv) AS cumin
      FROM gv
    ),
    tot AS (
      SELECT event_type, CAST(sum(t) AS BIGINT) AS nt FROM gv GROUP BY 1
    ),
    med AS (
      SELECT c.event_type,
        max(CASE WHEN c.cumin - c.t < (tot.nt + 1) // 2
                  AND (tot.nt + 1) // 2 <= c.cumin THEN c.cv END)
        + max(CASE WHEN c.cumin - c.t < (tot.nt + 2) // 2
                    AND (tot.nt + 2) // 2 <= c.cumin THEN c.cv END) AS m2
      FROM c JOIN tot USING (event_type) GROUP BY 1
    ),
    z AS (
      SELECT e.event_type, abs(2 * e.cv - med.m2) AS z
      FROM e JOIN med USING (event_type)
    ),
    gr AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(z) AS HUGEINT) AS s,
        CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS q
      FROM z GROUP BY 1
    ),
    fin AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
        CAST(count(*) AS BIGINT) AS k,
        CAST(sum(s * s // n) AS HUGEINT) AS a,
        CAST(sum(s) AS HUGEINT) AS st,
        CAST(sum(q) AS HUGEINT) AS qt
      FROM gr
    )
    SELECT nn AS n, k,
      CAST(a - st * st // nn AS BIGINT) AS ssb,
      CAST(qt - a AS BIGINT) AS ssw,
      round(
        (CAST(nn - k AS DOUBLE) * CAST(a - st * st // nn AS BIGINT))
        / (CAST(k - 1 AS DOUBLE) * CAST(qt - a AS BIGINT)), 6) AS f_stat
    FROM fin
    """,
)
def q_brown_forsythe_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Levene with MEDIAN
    centers) on `value` across event types — the missing assumption
    check behind `anova_value_by_type` (ANOVA's F is only calibrated
    under equal group variances; BF is the robust standard test for
    that premise). One-way ANOVA F applied to absolute deviations from
    each group's exact MEDIAN.

    Exactness: values quantize to cv = round(100·value) (the
    mood_median convention, proven cross-engine); group medians are
    exact order statistics found by cumulative counts over distinct
    values — DOUBLED (vlo+vhi) so half-integer medians stay BIGINT,
    and z = |2·cv − m2| is the doubled deviation (the ×2 cancels in
    F's ratio). Sg, Qg = Σz, Σz² are exact integers; SSB/SSW assemble
    via exact integer floor division (DECIMAL(38,0) div ↔ HUGEINT //,
    quotients ≤ ~2.5e14 so Spark's LONG div result cannot overflow);
    the ≤6-unit floor slack is ~1e-13 relative and identical in both
    engines. One double ratio at the end.

    Scale shape: distinct-value hash agg → per-type cumulative counts
    via the two-pass global_running_sum + triangular type-offset
    broadcast (no per-type window over raw rows); medians broadcast
    back (k rows); two more hash aggs. Nothing global-windowed."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
        )
    )
    gv = e.groupBy("event_type", "cv").agg(F.count(F.lit(1)).alias("t"))
    c = global_running_sum(gv, ["event_type", "cv"], "t", "gcum")
    tot = gv.groupBy("event_type").agg(F.sum("t").alias("nt"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(
            F.broadcast(b),
            F.col("b.event_type") < F.col("a.event_type"),
            "left",
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.coalesce(F.sum("b.nt"), F.lit(0)).alias("off"),
            F.max("a.nt").alias("nt"),
        )
    )
    j = c.join(F.broadcast(off), "event_type").withColumn(
        "cumin", F.col("gcum") - F.col("off")
    )
    plo = F.expr("(nt + 1) div 2")
    phi = F.expr("(nt + 2) div 2")
    med = j.groupBy("event_type").agg(
        (
            F.max(
                F.when(
                    (F.col("cumin") - F.col("t") < plo)
                    & (plo <= F.col("cumin")),
                    F.col("cv"),
                )
            )
            + F.max(
                F.when(
                    (F.col("cumin") - F.col("t") < phi)
                    & (phi <= F.col("cumin")),
                    F.col("cv"),
                )
            )
        ).alias("m2")
    )
    z = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("cv") - F.col("m2")).alias("z")
    )
    gr = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("z") * F.col("z")).cast("decimal(38,0)")
        ).alias("q"),
    )
    fin = gr.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.expr("(s * s) div n").cast("decimal(38,0)")).alias("a"),
        F.sum("s").alias("st"),
        F.sum("q").alias("qt"),
    )
    ssb = F.expr("CAST(a - ((st * st) div nn) AS BIGINT)")
    ssw = F.expr("CAST(qt - a AS BIGINT)")
    return fin.select(
        F.col("nn").alias("n"),
        "k",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        F.round(
            ((F.col("nn") - F.col("k")).cast("double") * ssb)
            / ((F.col("k") - 1).cast("double") * ssw),
            6,
        ).alias("f_stat"),
    )


@register(
    "hodges_lehmann_click_vs_view",
    """
    WITH e AS (
      SELECT event_type, epoch_ns(ts) // 1000 // 3600000000 AS h,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    x AS (SELECT h, CAST(sum(cv) AS BIGINT) AS xc FROM e
          WHERE event_type = 'click' GROUP BY h),
    y AS (SELECT h, CAST(sum(cv) AS BIGINT) AS yc FROM e
          WHERE event_type = 'view' GROUP BY h),
    meta AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS m,
             (SELECT CAST(count(*) AS BIGINT) FROM y) AS n
    ),
    dv AS (
      SELECT x.xc - y.yc AS d, CAST(count(*) AS BIGINT) AS t
      FROM x, y GROUP BY 1
    ),
    cum AS (SELECT d, t, sum(t) OVER (ORDER BY d) AS c FROM dv),
    sel AS (
      SELECT
        max(CASE WHEN c - t < (m * n + 1) // 2
                  AND (m * n + 1) // 2 <= c THEN d END) AS dlo,
        max(CASE WHEN c - t < (m * n + 2) // 2
                  AND (m * n + 2) // 2 <= c THEN d END) AS dhi,
        max(m) AS m, max(n) AS n
      FROM cum, meta
    )
    SELECT m AS m_hours, n AS n_hours, m * n AS n_pairs,
      round(CAST(dlo + dhi AS DOUBLE) / 200.0, 6) AS hl_shift
    FROM sel
    """,
)
def q_hodges_lehmann_click_vs_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hodges-Lehmann shift estimator between click and view HOURLY
    volumes: the median of all m·n pairwise differences — the robust
    EFFECT-SIZE companion to `mannwhitney_u_click_view` (U says the
    distributions differ; HL says BY HOW MUCH, with 0.29 breakdown
    robustness where a difference of means has none). The hourly
    measure is the SUM of quantized values (hourly event counts are
    equal across types by fixture construction — a count-based shift
    is identically 0 at every SF and certifies nothing, the r4
    vacuousness lesson; value mass genuinely differs).

    Exactness: hourly value sums are exact BIGINTs (cv = round(100·v),
    the mood_median convention), so every pairwise
    difference is an integer; the median is an exact order statistic
    over the difference multiset (doubled-position trick: dlo + dhi
    keeps the half-integer median exact until one final /2.0).

    Scale shape: HL on raw samples is O(N²) and unbounded — this query
    deliberately estimates the shift between TIME-BUCKET aggregates,
    so the pair space is |hours|² (calendar-bounded, independent of
    row count). Per-hour hash aggs shrink the corpus first; the pair
    join is a broadcast product of two tiny frames; the difference
    median reuses the two-pass running-sum (no global window)."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
    )
    h = F.expr("unix_micros(ts) div 3600000000").alias("h")
    cv = F.round(F.col("value") * 100).cast("bigint").alias("cv")
    x = (
        e.filter(F.col("event_type") == "click")
        .select(h, cv)
        .groupBy("h")
        .agg(F.sum("cv").alias("xc"))
    )
    y = (
        e.filter(F.col("event_type") == "view")
        .select(h, cv)
        .groupBy("h")
        .agg(F.sum("cv").alias("yc"))
    )
    meta = x.agg(F.count(F.lit(1)).alias("m")).crossJoin(
        F.broadcast(y.agg(F.count(F.lit(1)).alias("n")))
    )
    dv = (
        x.crossJoin(F.broadcast(y))
        .select((F.col("xc") - F.col("yc")).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    cum = global_running_sum(dv, ["d"], "t", "c")
    plo = F.expr("(m * n + 1) div 2")
    phi = F.expr("(m * n + 2) div 2")
    sel = cum.crossJoin(F.broadcast(meta)).agg(
        F.max(
            F.when(
                (F.col("c") - F.col("t") < plo) & (plo <= F.col("c")),
                F.col("d"),
            )
        ).alias("dlo"),
        F.max(
            F.when(
                (F.col("c") - F.col("t") < phi) & (phi <= F.col("c")),
                F.col("d"),
            )
        ).alias("dhi"),
        F.max("m").alias("m"),
        F.max("n").alias("n"),
    )
    return sel.select(
        F.col("m").alias("m_hours"),
        F.col("n").alias("n_hours"),
        (F.col("m") * F.col("n")).alias("n_pairs"),
        F.round(
            (F.col("dlo") + F.col("dhi")).cast("double") / F.lit(200.0), 6
        ).alias("hl_shift"),
    )


@register(
    "wasserstein_click_vs_view",
    """
    WITH e AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cv,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
    ),
    g AS (
      SELECT cv, CAST(sum(a) AS BIGINT) AS t1,
        CAST(sum(1 - a) AS BIGINT) AS t2
      FROM e GROUP BY cv
    ),
    tot AS (
      SELECT CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t2) AS BIGINT) AS n2
      FROM g
    ),
    d AS (
      SELECT cv,
        sum(t1 * tot.n2 - t2 * tot.n1) OVER (ORDER BY cv) AS dc,
        lead(cv) OVER (ORDER BY cv) AS nxt
      FROM g, tot
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(CAST(sum(CAST(abs(dc) AS HUGEINT) * (nxt - cv))
                  AS VARCHAR) AS DOUBLE) AS wfp
      FROM d WHERE nxt IS NOT NULL
    )
    SELECT tot.n1, tot.n2, s.n_distinct + 1 AS n_values,
      round(s.wfp / (CAST(tot.n1 AS DOUBLE) * tot.n2 * 100.0), 6) AS w1
    FROM s, tot
    """,
)
def q_wasserstein_click_vs_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-Wasserstein (earth mover's) distance between the click and
    view `value` distributions — the INTEGRAL companion to
    `ks_two_sample_sources`' sup-norm: W1 = ∫|F1−F2| dx weights the
    whole CDF gap by how far mass must move, the metric drift
    monitors actually alert on (KS sees a spike, W1 sees the cost).

    Exactness: W1 over the sorted distinct values v_i equals
    Σ |F1(v_i)−F2(v_i)|·(v_{i+1}−v_i); with counts on the common
    denominator n1·n2, each term is |cum(t1·n2 − t2·n1)| · Δcv — all
    exact BIGINT products (|D| ≤ n1·n2, Δcv ≤ value span) summed in
    DECIMAL(38,0), crossing to double via STRING (decimal→double
    double-rounding trap), then ONE division by n1·n2·100.

    Scale shape: one hash agg on distinct quantized values; the
    cumulative mass-imbalance D(v) AND the row number for the rn+1
    neighbor-gap equi-join come from ONE fused two-pass sweep
    (global_running_sum_row_number, r13 — previously global_row_number
    fed global_running_sum, range-exchanging and pinning the value
    table twice on the same cv order) — no global window, no lead()
    over an unbounded frame; everything after the first agg is
    |distinct values|-sized."""
    from ..operators.ranking import global_running_sum_row_number

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("a"),
        )
    )
    g = e.groupBy("cv").agg(
        F.sum("a").alias("t1"), F.sum(1 - F.col("a")).alias("t2")
    )
    tot = g.agg(F.sum("t1").alias("n1"), F.sum("t2").alias("n2"))
    gs = g.crossJoin(F.broadcast(tot)).select(
        "cv",
        (
            F.col("t1") * F.col("n2") - F.col("t2") * F.col("n1")
        ).alias("sgn"),
    )
    dc = global_running_sum_row_number(
        gs, ["cv"], "sgn", sum_col="dc", rn_col="rn"
    )
    l, r = dc.alias("l"), dc.alias("r")
    terms = l.join(
        r, F.col("l.rn") + 1 == F.col("r.rn"), "inner"
    ).select(
        F.col("l.dc").alias("dc"),
        (F.col("r.cv") - F.col("l.cv")).alias("gap"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            (F.abs(F.col("dc")) * F.col("gap")).cast("decimal(38,0)")
        )
        .cast("string")
        .cast("double")
        .alias("wfp"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        (F.col("n_distinct") + 1).alias("n_values"),
        F.round(
            F.col("wfp")
            / (F.col("n1").cast("double") * F.col("n2") * F.lit(100.0)),
            6,
        ).alias("w1"),
    )


def _mmr_step_ctes(k_steps: int) -> str:
    """Generate the unrolled MMR greedy steps as MATERIALIZED CTEs
    (the markov_removal_attribution technique: DuckDB recursive CTEs
    cannot re-aggregate over the working set per step, and without
    AS MATERIALIZED the planner re-inlines each step's subtree
    exponentially). Step k picks argmax(7·reln − 3·maxsim) over the
    not-yet-selected candidates, maxsim = max Jaccard to the picks so
    far; ties break on doc_id."""
    parts = [
        """sel1 AS MATERIALIZED (
      SELECT doc_id, reln, CAST(0 AS BIGINT) AS maxsim,
        7 * reln AS mmr, CAST(1 AS BIGINT) AS rank
      FROM cand ORDER BY 7 * reln DESC, doc_id LIMIT 1
    ),
    selu1 AS MATERIALIZED (SELECT doc_id FROM sel1)"""
    ]
    for k in range(2, k_steps + 1):
        km = k - 1
        parts.append(
            f"""sc{k} AS MATERIALIZED (
      SELECT c.doc_id, c.reln, coalesce(max(sv.s), 0) AS ms
      FROM cand c
      LEFT JOIN simv sv ON sv.a = c.doc_id
        AND sv.b IN (SELECT doc_id FROM selu{km})
      WHERE c.doc_id NOT IN (SELECT doc_id FROM selu{km})
      GROUP BY c.doc_id, c.reln
    ),
    sel{k} AS MATERIALIZED (
      SELECT doc_id, reln, ms AS maxsim, 7 * reln - 3 * ms AS mmr,
        CAST({k} AS BIGINT) AS rank
      FROM sc{k} ORDER BY 7 * reln - 3 * ms DESC, doc_id LIMIT 1
    ),
    selu{k} AS MATERIALIZED (
      SELECT doc_id FROM selu{km} UNION ALL SELECT doc_id FROM sel{k}
    )"""
        )
    return ",\n    ".join(parts)


_MMR_K = 10

_MMR_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, w FROM documents,
        unnest(string_split(text, ' ')) AS t(w) WHERE w <> ''
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, w
    ),
    top3 AS MATERIALIZED (
      SELECT w FROM (
        SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY w
        ORDER BY cf DESC, w LIMIT 3)
    ),
    dfq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df
      FROM tf JOIN top3 USING (w) GROUP BY w
    ),
    rels AS (
      SELECT tf.doc_id,
        CAST(sum(tf.tf * (1000000 // dfq.df)) AS BIGINT) AS rel
      FROM tf JOIN dfq USING (w) GROUP BY tf.doc_id
    ),
    cand0 AS MATERIALIZED (
      SELECT doc_id, rel FROM rels ORDER BY rel DESC, doc_id LIMIT 30
    ),
    rmax AS (SELECT max(rel) AS rm FROM cand0),
    cand AS MATERIALIZED (
      SELECT doc_id, rel * 1000000000 // rm AS reln FROM cand0, rmax
    ),
    ctok AS MATERIALIZED (
      SELECT DISTINCT t.doc_id, t.w
      FROM tok t JOIN cand ON cand.doc_id = t.doc_id
    ),
    clen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS l
             FROM ctok GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS i
      FROM ctok x JOIN ctok y ON x.w = y.w AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    simv AS MATERIALIZED (
      SELECT a, b, i * 1000000000 // (la.l + lb.l - i) AS s
      FROM inter JOIN clen la ON la.doc_id = inter.a
                 JOIN clen lb ON lb.doc_id = inter.b
      UNION ALL
      SELECT b, a, i * 1000000000 // (la.l + lb.l - i)
      FROM inter JOIN clen la ON la.doc_id = inter.a
                 JOIN clen lb ON lb.doc_id = inter.b
    ),
    {_mmr_step_ctes(_MMR_K)}
    SELECT rank, doc_id, reln, maxsim, mmr FROM (
      {" UNION ALL ".join(f"SELECT * FROM sel{k}" for k in range(1, _MMR_K + 1))}
    ) ORDER BY rank
"""


@register("mmr_rerank_diverse_topk", _MMR_ORACLE)
def q_mmr_rerank_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking: the diversity-aware
    top-10 a RAG stack serves AFTER retrieval — bm25_topk/dirichlet
    rank by relevance alone, so near-duplicate hits crowd the context
    window; MMR greedily picks argmax λ·rel − (1−λ)·max-sim-to-picked
    (λ = 0.7), trading the two off (Carbonell-Goldstein '98).

    Candidate pool: top-30 docs by integer tf-idf relevance for the
    top-3 collection-frequency terms (tf · (1e6 // df), the
    sparse_cosine integer-weight discipline). Relevance normalizes to
    reln = rel·1e9 // max-rel; doc-doc similarity is exact Jaccard on
    distinct word sets as simv = |∩|·1e9 // |∪|. The greedy score
    7·reln − 3·maxsim is pure BIGINT, so every pick (ties → doc_id)
    is bit-identical cross-engine. The 10-step greedy runs as driver
    Python ints over the COLLECTED candidate frame (30 rels + ≤435
    pair sims — the bounded-domain-collect precedent of
    markov_removal_attribution/BPE; the pool size, not the corpus,
    bounds the collect); the oracle replays the identical integer
    updates via 10 unrolled MATERIALIZED CTE steps.

    Scale shape: corpus-side work is the tf/df hash aggs + one
    TakeOrdered(30); pairwise similarity touches only the 30
    candidates (token semi-join, then a 30×30 bounded pair join).
    At 100 TB only the retrieval stage grows; the rerank stays O(k²)."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    top3 = (
        tf.groupBy("w")
        .agg(F.sum("tf").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("w"))
        .limit(3)
        .select("w")
    )
    dfq = (
        tf.join(F.broadcast(top3), "w")
        .groupBy("w")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    rels = (
        tf.join(F.broadcast(dfq), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.expr("1000000 div df")).alias("rel")
        )
    )
    cand0 = rels.orderBy(F.desc("rel"), F.asc("doc_id")).limit(30)
    rows = cand0.collect()
    if not rows:
        # degrade like the oracle: an empty candidate pool emits no rows
        return spark.createDataFrame(
            [], "rank bigint, doc_id bigint, reln bigint, "
            "maxsim bigint, mmr bigint"
        )
    rm = max(r["rel"] for r in rows)
    cand = {r["doc_id"]: (r["rel"] * 1000000000) // rm for r in rows}
    cand_ids = sorted(cand)
    cdf = spark.createDataFrame(
        [(i,) for i in cand_ids], ["doc_id"]
    )
    ctok = (
        tok.join(F.broadcast(cdf), "doc_id")
        .select("doc_id", "w")
        .distinct()
    )
    clen = ctok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("l"))
    x, y = ctok.alias("x"), ctok.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.w") == F.col("y.w"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    la, lb = clen.alias("la"), clen.alias("lb")
    simdf = (
        inter.join(F.broadcast(la), F.col("la.doc_id") == F.col("a"))
        .join(F.broadcast(lb), F.col("lb.doc_id") == F.col("b"))
        .select(
            "a",
            "b",
            F.expr("i * 1000000000 div (la.l + lb.l - i)").alias("s"),
        )
    )
    sims: dict[tuple, int] = {}
    for r in simdf.collect():
        sims[(r["a"], r["b"])] = r["s"]
        sims[(r["b"], r["a"])] = r["s"]

    selected: list[tuple] = []
    remaining = set(cand_ids)
    for rank in range(1, _MMR_K + 1):
        if not remaining:
            # pool smaller than K: emit fewer rows, like the oracle's
            # unrolled CTEs (each step is a LEFT-ish CTE that just
            # produces nothing once candidates run out)
            break
        best = None
        for d in remaining:
            ms = max(
                (sims.get((d, s[1]), 0) for s in selected), default=0
            )
            mmr = 7 * cand[d] - 3 * ms
            key = (-mmr, d)
            if best is None or key < best[0]:
                best = (key, d, ms, mmr)
        _, d, ms, mmr = best
        selected.append((rank, d, cand[d], ms, mmr))
        remaining.discard(d)
    return spark.createDataFrame(
        selected, "rank bigint, doc_id bigint, reln bigint, "
        "maxsim bigint, mmr bigint"
    )


#: nDCG discount weights floor(1e12 / log2(r+1)) for ranks 1..10,
#: precomputed in Python (the _BH_THRESHOLDS recipe: neither engine
#: evaluates a log at runtime — rank weights enter as shared literals,
#: so the DCG sum is exact integer arithmetic).
_NDCG_W = (
    1000000000000,
    630929753571,
    500000000000,
    430676558073,
    386852807234,
    356207187108,
    333333333333,
    315464876785,
    301029995663,
    289064826317,
)

_NDCG_W_SQL = "VALUES " + ", ".join(
    f"({r + 1}, CAST({w} AS BIGINT))" for r, w in enumerate(_NDCG_W)
)


@register(
    "ndcg_mrr_dense_retrieval",
    f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scaled AS (
      SELECT vec_id, v,
        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS s
      FROM base
    ),
    codes AS (
      SELECT vec_id,
        list_transform(v, x -> CAST(floor(x / s + 0.5) AS INT)) AS q
      FROM scaled
    ),
    normed AS (
      SELECT vec_id, q,
        sqrt(CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * x))
             AS DOUBLE)) AS qn
      FROM codes
    ),
    ranked AS (
      SELECT neighbor_id, rank FROM (
        SELECT c.vec_id AS neighbor_id,
          ROW_NUMBER() OVER (ORDER BY
            CAST(list_sum(list_transform(generate_series(1, len(qs.q)),
              i -> CAST(qs.q[i] AS BIGINT) * c.q[i])) AS DOUBLE)
              / (qs.qn * c.qn) DESC,
            c.vec_id ASC) AS rank
        FROM normed qs, normed c
        WHERE qs.vec_id = 0 AND c.vec_id <> 0
      ) WHERE rank <= 10
    ),
    tok AS (
      SELECT doc_id, w FROM documents,
        unnest(string_split(text, ' ')) AS t(w) WHERE w <> ''
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, w
    ),
    top12 AS (
      SELECT w, cf FROM (
        SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY w
        ORDER BY cf DESC, w LIMIT 12)
    ),
    qterms AS (
      SELECT w FROM (SELECT w FROM top12 ORDER BY cf ASC, w DESC LIMIT 3)
    ),
    grades AS (
      SELECT tf.doc_id, CAST(count(DISTINCT tf.w) AS BIGINT) AS grade
      FROM tf JOIN qterms USING (w) GROUP BY tf.doc_id
    ),
    wt(rank, wt) AS ({_NDCG_W_SQL}),
    dcg AS (
      SELECT CAST(sum(coalesce(g.grade, 0) * wt.wt) AS BIGINT) AS dcg_fp,
        min(CASE WHEN coalesce(g.grade, 0) = 3 THEN ranked.rank END)
          AS first_rel,
        CAST(sum(CASE WHEN coalesce(g.grade, 0) >= 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_rel
      FROM ranked JOIN wt USING (rank)
      LEFT JOIN grades g ON g.doc_id = ranked.neighbor_id
    ),
    ideal AS (
      SELECT grade, ROW_NUMBER() OVER (ORDER BY grade DESC, vec_id ASC)
        AS rank
      FROM (
        SELECT b.vec_id, coalesce(g.grade, 0) AS grade
        FROM base b LEFT JOIN grades g ON g.doc_id = b.vec_id
        WHERE b.vec_id <> 0
      ) QUALIFY rank <= 10
    ),
    idcg AS (
      SELECT CAST(sum(ideal.grade * wt.wt) AS BIGINT) AS idcg_fp
      FROM ideal JOIN wt USING (rank)
    )
    SELECT dcg.dcg_fp, idcg.idcg_fp,
      round(CAST(dcg.dcg_fp AS DOUBLE) / idcg.idcg_fp, 6) AS ndcg10,
      round(coalesce(1.0 / dcg.first_rel, 0.0), 6) AS mrr,
      round(CAST(dcg.n_rel AS DOUBLE) / 10.0, 6) AS p_at_10
    FROM dcg, idcg
    """,
)
def q_ndcg_mrr_dense_retrieval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """nDCG@10 / MRR / precision@10 of the DENSE (int8-quantized
    cosine) retrieval for query vector 0, graded by LEXICAL relevance
    — the standard hybrid-stack evaluation row: does embedding
    retrieval surface documents that actually contain the query's
    terms? (Grading the lexical ranking by its own terms is
    tautologically all-3s on this corpus — measured — so the metric
    is only non-vacuous across modalities.) Grades = number of the 3
    query terms (collection-frequency ranks 10-12, the probed spread)
    present in the doc, 0..3; a retrievable vector with no doc text
    grades 0.

    Exactness: ranks come from the integer-dot quantized scorer
    (ann_quantized_topk's proven-parity scoring); grades are exact
    integers; the log2 discounts enter as shared Python-precomputed
    literals (_NDCG_W, the _BH_THRESHOLDS recipe), so DCG/IDCG are
    exact BIGINT sums (≤3e13, double-safe) with two final divisions.

    Scale shape: one broadcast-query scan over the embedding corpus
    (the quantized_topk plan), tf/cf hash aggs for grades, and two
    TakeOrdered(10) windows (WindowGroupLimit) — nothing global."""
    from ..operators.similarity import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ranked = quantized_topk(emb, qdf, k=10).select("neighbor_id", "rank")

    tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    top12 = (
        tf.groupBy("w")
        .agg(F.sum("tf").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("w"))
        .limit(12)
    )
    qterms = top12.orderBy(F.asc("cf"), F.desc("w")).limit(3).select("w")
    grades = (
        tf.join(F.broadcast(qterms), "w")
        .groupBy("doc_id")
        .agg(F.countDistinct("w").alias("grade"))
    )
    wt = F.element_at(
        F.array(*[F.lit(w) for w in _NDCG_W]), F.col("rank")
    )
    g = F.coalesce(F.col("grade"), F.lit(0))
    dcg = (
        ranked.join(
            F.broadcast(grades),
            F.col("doc_id") == F.col("neighbor_id"),
            "left",
        )
        .select("rank", g.alias("g"))
        .agg(
            F.sum(F.col("g") * wt).alias("dcg_fp"),
            F.min(
                F.when(F.col("g") == 3, F.col("rank"))
            ).alias("first_rel"),
            F.sum(
                F.when(F.col("g") >= 2, 1).otherwise(0)
            ).alias("n_rel"),
        )
    )
    from pyspark.sql.window import Window as _W

    cands = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id")
        .join(
            F.broadcast(grades),
            F.col("doc_id") == F.col("vec_id"),
            "left",
        )
        .select("vec_id", g.alias("grade"))
    )
    ideal = (
        cands.withColumn(
            "rank",
            F.row_number().over(
                _W.orderBy(F.desc("grade"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rank") <= 10)
        .select("grade", "rank")
    )
    idcg = ideal.select(
        (F.col("grade") * wt).alias("t")
    ).agg(F.sum("t").alias("idcg_fp"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.col("dcg_fp").cast("bigint").alias("dcg_fp"),
        F.col("idcg_fp").cast("bigint").alias("idcg_fp"),
        F.round(
            F.col("dcg_fp").cast("double") / F.col("idcg_fp"), 6
        ).alias("ndcg10"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
            ),
            6,
        ).alias("mrr"),
        F.round(F.col("n_rel").cast("double") / F.lit(10.0), 6).alias(
            "p_at_10"
        ),
    )


@register(
    "nelson_aalen_hazard",
    """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
    ),
    pur AS (
      SELECT * FROM e WHERE event_type = 'purchase' AND cv IS NOT NULL
    ),
    gv AS (SELECT cv, count(*) AS t FROM pur GROUP BY cv),
    cum AS (SELECT cv, t, sum(t) OVER (ORDER BY cv) AS c FROM gv),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pur),
    cut AS (
      SELECT min(cv) AS cut FROM cum, np WHERE c >= (9 * np.n + 9) // 10
    ),
    conv AS (
      SELECT user_id, min(us) AS tc
      FROM pur, cut WHERE pur.cv > cut.cut GROUP BY user_id
    ),
    peru AS (SELECT user_id, min(us) AS t0, max(us) AS tl FROM e GROUP BY 1),
    surv AS (
      SELECT peru.user_id % 2 AS g,
        (COALESCE(conv.tc, peru.tl) - peru.t0) // 86400000000 AS dur,
        CASE WHEN conv.tc IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM peru LEFT JOIN conv ON peru.user_id = conv.user_id
    ),
    cnt AS (
      SELECT g, dur, CAST(sum(ev) AS BIGINT) AS d,
        CAST(count(*) AS BIGINT) AS c
      FROM surv GROUP BY g, dur
    ),
    ar AS (
      SELECT d.g, d.dur, d.d,
        CAST(sum(c.c) AS BIGINT) AS n_at_risk
      FROM cnt d JOIN cnt c ON c.g = d.g AND c.dur >= d.dur
      WHERE d.d > 0
      GROUP BY 1, 2, 3
    ),
    terms AS (
      SELECT g, dur, d, n_at_risk,
        CAST(d AS HUGEINT) * 1000000000000 // n_at_risk AS hfp
      FROM ar
    )
    SELECT g, dur, d AS deaths, n_at_risk,
      round(CAST(CAST(sum(hfp) OVER (
        PARTITION BY g ORDER BY dur) AS VARCHAR) AS DOUBLE) / 1e12, 6)
        AS cum_hazard
    FROM terms
    ORDER BY g, dur
    """,
)
def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curves H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ per
    cohort — the CURVE companion to log_rank_conversion_survival's
    scalar test (the test says the cohorts differ; the hazard curve
    shows WHERE along the timeline), on the identical conversion_surv
    frame so all three survival queries certify one construction.
    Unlike Kaplan-Meier's sequential product, the hazard is a plain
    SUM of per-time terms — exactly the shape SQL and fixed-point
    arithmetic replay losslessly.

    Exactness: each increment accumulates as (d·1e12) div n — exact
    integer floor division (DECIMAL(38,0) div ↔ HUGEINT //) — and the
    cumulative sum is an integer prefix sum (order-free per prefix);
    decimal crosses to double via STRING.

    Scale shape: per-user hash agg, then everything on ≤|days|·2 rows;
    the at-risk table is the per-cohort broadcast non-equi self-join
    (calendar-bounded); the final per-cohort prefix sum runs over that
    tiny frame via the two-pass helper (no global window)."""
    from ..operators.ranking import global_running_sum

    surv = conversion_surv(spark, sf_dir)
    cnt = surv.groupBy("g", "dur").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    d = cnt.filter(F.col("d") > 0).alias("d")
    c = cnt.alias("c")
    ar = (
        d.join(
            F.broadcast(c),
            (F.col("c.g") == F.col("d.g"))
            & (F.col("c.dur") >= F.col("d.dur")),
        )
        .groupBy(
            F.col("d.g").alias("g"),
            F.col("d.dur").alias("dur"),
            F.col("d.d").alias("deaths"),
        )
        .agg(F.sum(F.col("c.c")).alias("n_at_risk"))
    )
    terms = ar.select(
        "g",
        "dur",
        "deaths",
        "n_at_risk",
        F.expr(
            "(CAST(deaths AS DECIMAL(38,0)) * 1000000000000)"
            " div n_at_risk"
        ).alias("hfp"),
    )
    cumh = global_running_sum(
        terms.withColumn(
            "hfp", F.col("hfp").cast("decimal(38,0)")
        ),
        ["g", "dur"],
        "hfp",
        "gcum",
    )
    tot = terms.groupBy("g").agg(
        F.sum(F.col("hfp").cast("decimal(38,0)")).alias("gt")
    )
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(F.broadcast(b), F.col("b.g") < F.col("a.g"), "left")
        .groupBy(F.col("a.g").alias("g"))
        .agg(F.coalesce(F.sum("b.gt"), F.lit(0)).alias("off"))
    )
    return (
        cumh.join(F.broadcast(off), "g")
        .select(
            "g",
            "dur",
            "deaths",
            "n_at_risk",
            F.round(
                (F.col("gcum") - F.col("off"))
                .cast("string")
                .cast("double")
                / F.lit(1e12),
                6,
            ).alias("cum_hazard"),
        )
        .orderBy("g", "dur")
    )


def pava_pool_bins(bins: list) -> list:
    """Pure-integer PAVA over ordered (bin_id, s, n) rows, leftmost
    violator merged first (mean order compared by exact cross-
    multiplication). Returns one (bin_id, n, s, pool_start, pool_pos,
    pool_n) row per input bin. Extracted for direct property-testing
    against an independent stack-based PAVA."""
    pools = [[b, s, n] for b, s, n in bins]
    while True:
        i = next(
            (
                i
                for i in range(len(pools) - 1)
                if pools[i][1] * pools[i + 1][2]
                > pools[i + 1][1] * pools[i][2]
            ),
            None,
        )
        if i is None:
            break
        pools[i][1] += pools[i + 1][1]
        pools[i][2] += pools[i + 1][2]
        del pools[i + 1]
    out = []
    pi = 0
    for b, s, n in bins:
        while pi + 1 < len(pools) and pools[pi + 1][0] <= b:
            pi += 1
        start, ps, pn = pools[pi]
        out.append((b, n, s, start, ps, pn))
    return out


def _pava_oracle() -> str:
    """Calibration bins (the _calibration_oracle feature/label CTEs)
    + 11 unrolled PAVA merge steps as MATERIALIZED CTEs (bins ≤ 12 →
    ≤ 11 merges; steps past the fixpoint are idempotent, the kcore
    fixed-iteration recipe). Each step finds the LEFTMOST adjacent
    pool pair violating mean_left > mean_right — compared by exact
    integer cross-multiplication s_l·n_r > s_r·n_l, no rate division
    — and relabels the right pool's bins onto the left pool."""
    from ..operators.models import FROZEN_COEFS, FROZEN_INTERCEPT
    from ..operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    c_dtr, c_tts, c_nt, c_swr = (repr(c) for c in FROZEN_COEFS)
    z = (
        f"{FROZEN_INTERCEPT!r} + {c_dtr} * dtr + {c_tts} * tts"
        f" + {c_nt} * n_tok + {c_swr} * swr"
    )
    steps = []
    for k in range(1, 12):
        km = k - 1
        steps.append(
            f"""p{k} AS MATERIALIZED (
      SELECT lbl, CAST(sum(s) AS BIGINT) AS s, CAST(sum(n) AS BIGINT) AS n
      FROM l{km} GROUP BY lbl
    ),
    v{k} AS MATERIALIZED (
      SELECT a.lbl AS la, b.lbl AS lb
      FROM p{k} a JOIN p{k} b
        ON b.lbl = (SELECT min(lbl) FROM p{k} x WHERE x.lbl > a.lbl)
      WHERE a.s * b.n > b.s * a.n
      ORDER BY a.lbl LIMIT 1
    ),
    l{k} AS MATERIALIZED (
      SELECT bin_id, s, n,
        CASE WHEN lbl = (SELECT lb FROM v{k})
             THEN (SELECT la FROM v{k}) ELSE lbl END AS lbl
      FROM l{km}
    )"""
        )
    stepsql = ",\n    ".join(steps)
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (SELECT doc_id, toks,
      CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
      CAST(list_max(list_transform(list_distinct(toks),
        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks) AS tts,
      CAST(len(toks) AS DOUBLE) AS n_tok,
      CAST(len(list_filter(toks, t -> t IN ({sw}))) AS DOUBLE) / len(toks) AS swr
    FROM t),
    lab AS (SELECT doc_id,
      CASE WHEN len(toks) < 2 THEN 0.0 ELSE
        1.0 - CAST(len(list_distinct(list_transform(
          generate_series(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
          / (len(toks) - 1) END > {_QUALITY_LABEL_THRESHOLD} AS weak_label,
      least(greatest(CAST(floor({z}) AS BIGINT), -8), 3) AS bin_id
    FROM f),
    l0 AS MATERIALIZED (
      SELECT bin_id,
        CAST(sum(CASE WHEN weak_label THEN 1 ELSE 0 END) AS BIGINT) AS s,
        CAST(count(*) AS BIGINT) AS n,
        bin_id AS lbl
      FROM lab GROUP BY bin_id
    ),
    {stepsql},
    pools AS (
      SELECT lbl, CAST(sum(s) AS BIGINT) AS pool_pos,
        CAST(sum(n) AS BIGINT) AS pool_n
      FROM l11 GROUP BY lbl
    )
    SELECT l.bin_id AS logit_bin, l.n, l.s AS n_pos,
      l.lbl AS pool_start, pools.pool_pos, pools.pool_n,
      round(CAST(pools.pool_pos AS DOUBLE) / pools.pool_n, 6)
        AS calibrated_rate
    FROM l11 l JOIN pools USING (lbl)
    ORDER BY logit_bin
    """


@register("isotonic_calibration_pava", _pava_oracle())
def q_isotonic_calibration_pava(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic calibration of the frozen quality classifier via
    Pool-Adjacent-Violators: quality_calibration_bins SHOWS the
    reliability table (measured: the empirical label rate is
    non-monotone — 2 violations at sf0.01); this query FIXES it,
    producing the stepwise non-decreasing calibrated rate a serving
    layer would look up instead of a sigmoid. The standard
    calibration step between classifier training and production
    thresholding (Zadrozny-Elkan '02).

    Exactness: PAVA needs only ORDER comparisons of pool means —
    done by integer cross-multiplication (s_l·n_r > s_r·n_l), so the
    whole algorithm is exact BIGINT arithmetic; the calibrated rate
    divides once at output (round-6). Merge order is pinned
    (leftmost violator first); PAVA's solution is order-invariant,
    but both engines replay the identical order anyway. The ≤12-bin
    frame is a bounded-domain COLLECT (markov/BPE/MMR precedent);
    the oracle unrolls the ≤11 merges as MATERIALIZED CTEs,
    idempotent past the fixpoint.

    Scale shape: the corpus work is one scan into the ≤12-bin hash
    aggregate (the calibration_bins plan); PAVA itself touches 12
    rows regardless of corpus size."""
    from ..operators.models import frozen_logit_expr, quality_feature_frame

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(
        docs, label_threshold=_QUALITY_LABEL_THRESHOLD
    )
    z = frozen_logit_expr()
    binned = (
        feats.select(
            F.least(
                F.greatest(F.floor(z).cast("bigint"), F.lit(-8)), F.lit(3)
            ).alias("bin_id"),
            F.col("weak_label").cast("bigint").alias("wl"),
        )
        .groupBy("bin_id")
        .agg(F.sum("wl").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    bins = sorted(
        ((r["bin_id"], r["s"], r["n"]) for r in binned.collect()),
        key=lambda t: t[0],
    )
    out = pava_pool_bins(bins)
    # round via F.round (HALF_UP, matching DuckDB's round) — Python's
    # banker's round would diverge on exact .5 ties like 1/128
    return spark.createDataFrame(
        out,
        "logit_bin bigint, n bigint, n_pos bigint, pool_start bigint, "
        "pool_pos bigint, pool_n bigint",
    ).select(
        "*",
        F.round(
            F.col("pool_pos").cast("double") / F.col("pool_n"), 6
        ).alias("calibrated_rate"),
    )


@register(
    "iv_wald_estimate",
    """
    WITH e AS (
      SELECT user_id, event_type,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
    ),
    peru AS (
      SELECT user_id, user_id % 2 AS z,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          AS BIGINT) AS x,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN coalesce(cv, 0)
                 ELSE 0 END) AS BIGINT) AS y
      FROM e GROUP BY user_id
    ),
    g AS (
      SELECT z, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM peru GROUP BY z
    ),
    p AS (
      SELECT
        max(CASE WHEN z = 1 THEN n END) AS n1,
        max(CASE WHEN z = 0 THEN n END) AS n0,
        max(CASE WHEN z = 1 THEN sx END) AS sx1,
        max(CASE WHEN z = 0 THEN sx END) AS sx0,
        max(CASE WHEN z = 1 THEN sy END) AS sy1,
        max(CASE WHEN z = 0 THEN sy END) AS sy0
      FROM g
    )
    SELECT n1 AS n_g1, n0 AS n_g0,
      round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE) / (n1 * n0) / 100.0, 6)
        AS itt_y,
      round(CAST(sx1 * n0 - sx0 * n1 AS DOUBLE) / (n1 * n0), 6) AS itt_x,
      round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
            / (sx1 * n0 - sx0 * n1) / 100.0, 6) AS beta_iv
    FROM p
    """,
)
def q_iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable Wald estimator: per-user purchase value
    (y, cents) on click count (x), instrumented by the user-parity
    assignment z — the same as-if-randomized cohort split the survival
    queries use. Completes the causal-adjustment family
    (diff_in_diff, ab_test_cuped, stratified_ate): when x is
    endogenous (activity correlates with latent intent), OLS is
    biased; the Wald ratio of reduced-form to first-stage ITT effects
    β = cov(z,y)/cov(z,x) is the 2SLS estimate for a binary
    instrument.

    Exactness: group sums are exact BIGINTs; mean differences clear
    denominators by cross-multiplication (Sy1·n0 − Sy0·n1, bounded
    ~1e12), and the n1·n0 factor CANCELS in β, leaving one integer
    ratio → one double division (round-6). No float accumulation
    anywhere.

    Scale shape: per-user hash agg over the corpus, then a 2-row
    group reduce and a 1-row pivot — nothing else."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cv"),
    )
    peru = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.coalesce(F.col("cv"), F.lit(0)),
            ).otherwise(0)
        ).alias("y"),
    ).select((F.col("user_id") % 2).alias("z"), "x", "y")
    g = peru.groupBy("z").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    p = g.agg(
        F.max(F.when(F.col("z") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("z") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("z") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("z") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("z") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("z") == 0, F.col("sy"))).alias("sy0"),
    )
    dy = (F.col("sy1") * F.col("n0") - F.col("sy0") * F.col("n1")).cast(
        "double"
    )
    dx = (F.col("sx1") * F.col("n0") - F.col("sx0") * F.col("n1")).cast(
        "double"
    )
    return p.select(
        F.col("n1").alias("n_g1"),
        F.col("n0").alias("n_g0"),
        F.round(
            dy / (F.col("n1") * F.col("n0")) / F.lit(100.0), 6
        ).alias("itt_y"),
        F.round(dx / (F.col("n1") * F.col("n0")), 6).alias("itt_x"),
        F.round(
            dy
            / (
                F.col("sx1") * F.col("n0") - F.col("sx0") * F.col("n1")
            )
            / F.lit(100.0),
            6,
        ).alias("beta_iv"),
    )


def _median_polish_oracle(rounds: int = 2) -> str:
    """Unrolled median-polish rounds as MATERIALIZED CTEs over the
    5×7 (event_type, dow) count table. Each round: row sweep
    (subtract per-row median of 7 → index [4] of the sorted list,
    fold into row effects), polish col effects (median of 7), col
    sweep (per-col median of 5 → index [3]), polish row effects
    (median of 5). Odd dimensions make every median an exact integer
    order statistic — the whole polish is BIGINT arithmetic."""
    parts = [
        """c0 AS MATERIALIZED (
      SELECT event_type AS i,
        (CAST(floor((epoch_ns(ts) / 1000) / 86400000000) AS BIGINT) % 7)
          AS j,
        CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    re0 AS (SELECT DISTINCT i, CAST(0 AS BIGINT) AS v FROM c0),
    ce0 AS (SELECT DISTINCT j, CAST(0 AS BIGINT) AS v FROM c0),
    t0 AS (SELECT CAST(0 AS BIGINT) AS v)"""
    ]
    for k in range(1, rounds + 1):
        km = k - 1
        parts.append(
            f"""rm{k} AS MATERIALIZED (
      SELECT i, list_sort(list(v))[4] AS m FROM c{km} GROUP BY i
    ),
    ca{k} AS MATERIALIZED (
      SELECT c.i, c.j, c.v - rm{k}.m AS v
      FROM c{km} c JOIN rm{k} USING (i)
    ),
    rea{k} AS MATERIALIZED (
      SELECT re.i, re.v + rm{k}.m AS v
      FROM re{km} re JOIN rm{k} USING (i)
    ),
    cm{k} AS MATERIALIZED (
      SELECT list_sort(list(v))[4] AS m FROM ce{km}
    ),
    cea{k} AS MATERIALIZED (
      SELECT j, v - (SELECT m FROM cm{k}) AS v FROM ce{km}
    ),
    ta{k} AS MATERIALIZED (
      SELECT v + (SELECT m FROM cm{k}) AS v FROM t{km}
    ),
    jm{k} AS MATERIALIZED (
      SELECT j, list_sort(list(v))[3] AS m FROM ca{k} GROUP BY j
    ),
    c{k} AS MATERIALIZED (
      SELECT c.i, c.j, c.v - jm{k}.m AS v
      FROM ca{k} c JOIN jm{k} USING (j)
    ),
    ce{k} AS MATERIALIZED (
      SELECT ce.j, ce.v + jm{k}.m AS v
      FROM cea{k} ce JOIN jm{k} USING (j)
    ),
    rm2_{k} AS MATERIALIZED (
      SELECT list_sort(list(v))[3] AS m FROM rea{k}
    ),
    re{k} AS MATERIALIZED (
      SELECT i, v - (SELECT m FROM rm2_{k}) AS v FROM rea{k}
    ),
    t{k} AS MATERIALIZED (
      SELECT v + (SELECT m FROM rm2_{k}) AS v FROM ta{k}
    )"""
        )
    r = rounds
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT c0.i AS event_type, c0.j AS dow, c0.v AS observed,
      (SELECT v FROM t{r}) AS grand,
      re{r}.v AS row_effect, ce{r}.v AS col_effect,
      c{r}.v AS residual
    FROM c0 JOIN c{r} ON c{r}.i = c0.i AND c{r}.j = c0.j
    JOIN re{r} ON re{r}.i = c0.i JOIN ce{r} ON ce{r}.j = c0.j
    ORDER BY event_type, dow
    """
    )


_POLISH_ROUNDS = 2


@register("median_polish_type_dow", _median_polish_oracle(_POLISH_ROUNDS))
def q_median_polish_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the (event_type × day-of-week) count
    table: the ROBUST two-way decomposition observed = grand +
    row_effect + col_effect + residual — the outlier-resistant
    alternative to the two-way ANOVA means model (one anomalous day
    shifts a mean fit everywhere; the median fit isolates it in ONE
    residual cell, which is exactly what an anomaly triage wants).

    Exactness: the 5×7 table has ODD dimensions, so every sweep
    median is an exact integer order statistic (sorted-list index) —
    the entire polish (2 fixed rounds, row sweep → col-effect polish
    → col sweep → row-effect polish) stays in BIGINT; no floats
    anywhere, not even at output. Spark runs the polish as driver
    Python ints over the COLLECTED 35-cell table (bounded-domain
    collect — markov/MMR/PAVA precedent); the oracle unrolls the
    identical sweeps as MATERIALIZED CTEs with list_sort medians.

    Scale shape: corpus work is one (type, dow) hash aggregate; the
    polish itself touches 35 rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            (
                F.floor(F.unix_micros("ts") / F.lit(86400000000)) % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    rows = cells.collect()
    obs = {(r["event_type"], r["dow"]): r["v"] for r in rows}
    its = sorted({k[0] for k in obs})
    jts = sorted({k[1] for k in obs})
    res = dict(obs)
    re_ = {i: 0 for i in its}
    ce_ = {j: 0 for j in jts}
    t = 0

    def med(vals):
        s = sorted(vals)
        return s[(len(s) - 1) // 2]

    for _ in range(_POLISH_ROUNDS):
        for i in its:
            m = med([res[(i, j)] for j in jts])
            for j in jts:
                res[(i, j)] -= m
            re_[i] += m
        mc = med(list(ce_.values()))
        t += mc
        for j in jts:
            ce_[j] -= mc
        for j in jts:
            m = med([res[(i, j)] for i in its])
            for i in its:
                res[(i, j)] -= m
            ce_[j] += m
        mr = med(list(re_.values()))
        t += mr
        for i in its:
            re_[i] -= mr
    out = [
        (i, j, obs[(i, j)], t, re_[i], ce_[j], res[(i, j)])
        for i in its
        for j in jts
    ]
    return spark.createDataFrame(
        out,
        "event_type string, dow bigint, observed bigint, grand bigint, "
        "row_effect bigint, col_effect bigint, residual bigint",
    ).orderBy("event_type", "dow")


@register(
    "robust_stl_daily_volume",
    """
    WITH dv AS (
      SELECT epoch_ns(ts) // 1000 // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    ctr AS (
      SELECT a.day, a.v,
        list_sort(list(b.v))[4] AS trend,
        count(*) AS w
      FROM dv a JOIN dv b ON b.day BETWEEN a.day - 3 AND a.day + 3
      GROUP BY a.day, a.v
    ),
    det AS (
      SELECT day, v, trend, v - trend AS dt, day % 7 AS dow
      FROM ctr WHERE w = 7
    ),
    sea AS (
      SELECT dow,
        list_sort(list(dt))[CAST((count(*) + 1) // 2 AS INT)]
        + list_sort(list(dt))[CAST((count(*) + 2) // 2 AS INT)] AS m2
      FROM det GROUP BY dow
    )
    SELECT det.day, det.v AS volume, det.trend, det.dow,
      CAST(sea.m2 AS DOUBLE) / 2.0 AS seasonal,
      det.dt - CAST(sea.m2 AS DOUBLE) / 2.0 AS remainder
    FROM det JOIN sea USING (dow)
    ORDER BY det.day
    """,
)
def q_robust_stl_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust STL-lite decomposition of the daily event volume:
    trend = centered 7-day MEDIAN filter (full windows only),
    seasonal = per-day-of-week MEDIAN of the detrended series,
    remainder = the rest — volume = trend + seasonal + remainder.
    The time-axis twin of median_polish_type_dow: medians make one
    anomalous day show up in ONE remainder cell instead of smearing
    through a moving average (holt_linear / seasonal_naive are the
    mean-fit members of this family; this is the robust one an
    anomaly triage trusts).

    Exactness: every statistic is an exact integer order stat —
    rolling median of exactly 7 ints (sorted index 4), per-dow median
    via the DOUBLED lo+hi trick (per-dow counts are even or odd), one
    exact halving at output (x.5 doubles are IEEE-exact both
    engines). No accumulation anywhere.

    Scale shape: one hash agg to the ~|days| frame; the rolling
    window is a broadcast band self-join of that tiny frame (7 rows
    per day, calendar-bounded); per-dow medians group ≤|days| rows.
    At 100 TB only the first agg sees the corpus."""
    ev = load_table(spark, sf_dir, "events")
    dv = (
        ev.select(
            F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    a, b = dv.alias("a"), dv.alias("b")
    ctr = (
        a.join(
            F.broadcast(b),
            (F.col("b.day") >= F.col("a.day") - 3)
            & (F.col("b.day") <= F.col("a.day") + 3),
        )
        .groupBy(F.col("a.day").alias("day"), F.col("a.v").alias("v"))
        .agg(
            F.sort_array(F.collect_list(F.col("b.v"))).alias("arr"),
            F.count(F.lit(1)).alias("w"),
        )
        .filter(F.col("w") == 7)
        .select(
            "day",
            "v",
            F.element_at("arr", 4).alias("trend"),
        )
    )
    det = ctr.select(
        "day",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("dt"),
        (F.col("day") % 7).alias("dow"),
    )
    sea = (
        det.groupBy("dow")
        .agg(
            F.sort_array(F.collect_list("dt")).alias("arr"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("dow").alias("_dw"),
            (
                F.element_at(
                    "arr", F.expr("CAST((n + 1) div 2 AS INT)")
                )
                + F.element_at(
                    "arr", F.expr("CAST((n + 2) div 2 AS INT)")
                )
            ).alias("m2"),
        )
    )
    half = F.col("m2").cast("double") / F.lit(2.0)
    return (
        det.join(F.broadcast(sea), F.col("dow") == F.col("_dw"))
        .select(
            "day",
            F.col("v").alias("volume"),
            "trend",
            "dow",
            half.alias("seasonal"),
            (F.col("dt") - half).alias("remainder"),
        )
        .orderBy("day")
    )


@register(
    "timeseries_motif_discovery",
    """
    WITH dv AS (
      SELECT epoch_ns(ts) // 1000 // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    mx AS (SELECT max(day) AS md FROM dv),
    st AS (SELECT day AS s FROM dv, mx WHERE day <= mx.md - 6),
    pr AS (
      SELECT a.s AS sa, b.s AS sb
      FROM st a JOIN st b ON b.s - a.s >= 4
    ),
    sads AS (
      SELECT pr.sa, pr.sb,
        CAST(sum(abs(va.v - vb.v)) AS BIGINT) AS sad
      FROM pr, unnest(generate_series(0, 6)) AS t(k)
      JOIN dv va ON va.day = pr.sa + k
      JOIN dv vb ON vb.day = pr.sb + k
      GROUP BY pr.sa, pr.sb
    ),
    motif AS (
      SELECT 'motif' AS kind, sa AS start_a, sb AS start_b, sad
      FROM sads ORDER BY sad, sa, sb LIMIT 1
    ),
    nnd AS (
      SELECT s,
        min(sad) AS nn_sad,
        min(CASE WHEN sad = msad THEN os END) AS nn_start
      FROM (
        -- msad must be the GLOBAL per-start minimum over the unioned
        -- frame (both directions), matching the Spark window over the
        -- union; a branch-local min can name a non-nearest neighbor
        SELECT s, os, sad, min(sad) OVER (PARTITION BY s) AS msad
        FROM (
          SELECT sa AS s, sb AS os, sad FROM sads
          UNION ALL
          SELECT sb AS s, sa AS os, sad FROM sads
        )
      ) GROUP BY s
    ),
    discord AS (
      SELECT 'discord' AS kind, s AS start_a, nn_start AS start_b,
        nn_sad AS sad
      FROM nnd ORDER BY nn_sad DESC, s LIMIT 1
    )
    SELECT * FROM motif UNION ALL SELECT * FROM discord
    """,
)
def q_timeseries_motif_discovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matrix-profile-lite over the daily volume series: the MOTIF
    (most similar pair of 7-day windows, exclusion zone |Δstart| ≥ 4
    suppressing trivial self-matches — the matrix-profile discipline)
    and the DISCORD (window whose nearest neighbor is farthest — the
    subsequence anomaly). Distance = exact integer SAD of aligned
    daily volumes, so every comparison is engine-stable; ties break
    on start days. The subsequence view the point-wise anomaly
    queries (zscore/MAD/CUSUM) can't give: a normal-valued day inside
    an abnormal week pattern.

    Exactness: SADs are BIGINT sums of |v−v| over the 7 aligned days
    (computed by an offset equi-join, no arrays); argmin/argmax are
    deterministic TakeOrdered(1) with full tie-break keys.

    Scale shape: one corpus hash agg to the ~|days| frame; window
    pairs are a band self-join of that tiny frame × 7 offsets
    (calendar-bounded, ~2k rows); per-window nearest-neighbor minima
    partition by start day. Nothing touches the corpus twice."""
    ev = load_table(spark, sf_dir, "events")
    dv = (
        ev.select(
            F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    mx = dv.agg(F.max("day").alias("md"))
    st = (
        dv.crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.col("md") - 6)
        .select(F.col("day").alias("s"))
    )
    a, b = st.alias("a"), st.alias("b")
    pr = a.join(
        F.broadcast(b), F.col("b.s") - F.col("a.s") >= 4
    ).select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    ks = pr.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(6))))
    va = dv.select(F.col("day").alias("_da"), F.col("v").alias("va"))
    vb = dv.select(F.col("day").alias("_db"), F.col("v").alias("vb"))
    sads = (
        ks.join(F.broadcast(va), F.col("_da") == F.col("sa") + F.col("k"))
        .join(F.broadcast(vb), F.col("_db") == F.col("sb") + F.col("k"))
        .groupBy("sa", "sb")
        .agg(F.sum(F.abs(F.col("va") - F.col("vb"))).alias("sad"))
    )
    motif = (
        sads.orderBy("sad", "sa", "sb")
        .limit(1)
        .select(
            F.lit("motif").alias("kind"),
            F.col("sa").alias("start_a"),
            F.col("sb").alias("start_b"),
            "sad",
        )
    )
    both = sads.select(
        F.col("sa").alias("s"), F.col("sb").alias("os"), "sad"
    ).unionAll(
        sads.select(
            F.col("sb").alias("s"), F.col("sa").alias("os"), "sad"
        )
    )
    wmin = Window.partitionBy("s")
    nnd = (
        both.withColumn("msad", F.min("sad").over(wmin))
        .groupBy("s")
        .agg(
            F.min("sad").alias("nn_sad"),
            F.min(
                F.when(F.col("sad") == F.col("msad"), F.col("os"))
            ).alias("nn_start"),
        )
    )
    discord = (
        nnd.orderBy(F.desc("nn_sad"), F.asc("s"))
        .limit(1)
        .select(
            F.lit("discord").alias("kind"),
            F.col("s").alias("start_a"),
            F.col("nn_start").alias("start_b"),
            F.col("nn_sad").alias("sad"),
        )
    )
    return motif.unionAll(discord)


#: O'Brien-Fleming two-sided z-boundaries for K=4 equally-spaced looks
#: at overall α=0.05: z_k = C·√(K/k) with C = 2.0243 (the standard
#: OBF constant for 4 looks) — precomputed so neither engine touches a
#: boundary-crossing integral at runtime (the _BH_THRESHOLDS recipe).
_OBF_BOUNDS = (
    (1, 4.0486),
    (2, 2.862793),
    (3, 2.33746),
    (4, 2.0243),
)

_OBF_BOUNDS_SQL = "VALUES " + ", ".join(
    # CAST: a bare 2.0243 literal types as DECIMAL(5,4) in DuckDB while
    # Spark's lit() is DOUBLE — value-equal but representation-different
    # through the parity normalizers
    f"({k}, CAST({b} AS DOUBLE))" for k, b in _OBF_BOUNDS
)


@register(
    "obrien_fleming_sequential",
    f"""
    WITH e AS (
      SELECT user_id % 2 AS g,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
        (epoch_ns(ts) // 1000 // 86400000000)
          - (SELECT min(epoch_ns(ts) // 1000 // 86400000000) FROM events)
          AS rel_day
      FROM events
    ),
    looks(k, last_day) AS (VALUES (1, 6), (2, 13), (3, 20), (4, 29)),
    cum AS (
      SELECT looks.k, looks.last_day,
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN g = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
        CAST(sum(CASE WHEN g = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0
      FROM e JOIN looks ON e.rel_day <= looks.last_day
      GROUP BY looks.k, looks.last_day
    ),
    z AS (
      SELECT k, last_day, n1, n0, x1, x0,
        (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
        / sqrt((CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
               * (1.0 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
               * (1.0 / n1 + 1.0 / n0)) AS zval
      FROM cum
    ),
    b(k, bound) AS ({_OBF_BOUNDS_SQL})
    SELECT z.k AS look, z.last_day, z.n1, z.n0, z.x1, z.x0,
      round(z.zval, 6) AS z,
      b.bound,
      CASE WHEN abs(z.zval) >= b.bound THEN 1 ELSE 0 END AS reject
    FROM z JOIN b USING (k)
    ORDER BY look
    """,
)
def q_obrien_fleming_sequential(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """O'Brien-Fleming group-sequential monitoring of the purchase-
    rate difference between the user-parity cohorts: four equally
    spaced interim looks (cumulative weeks) with the OBF two-sided
    z-boundaries embedded as precomputed literals — conservative
    early, nominal-ish late, overall α = 0.05. The OTHER sequential-
    testing school beside sprt_purchase_decision's Wald walk: SPRT
    monitors per-observation, group-sequential monitors at scheduled
    interim analyses — what an experimentation platform actually
    ships for A/B stopping.

    Exactness: per-look cumulative counts are exact BIGINTs (looks
    join on relative day); each z is one shared IEEE expression tree
    over those counts (the two_proportion_ztest discipline); the
    boundary crossing is a literal comparison — no runtime
    distributional math anywhere (the _BH_THRESHOLDS recipe).

    Scale shape: one scan joined to the broadcast 4-row looks table
    (each event feeds the looks it precedes) into a 4-group hash
    aggregate; everything after is 4 rows."""
    ev = load_table(spark, sf_dir, "events")
    mn = ev.agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("d0")
    )
    e = ev.crossJoin(F.broadcast(mn)).select(
        (F.col("user_id") % 2).alias("g"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
        (
            F.expr("unix_micros(ts) div 86400000000") - F.col("d0")
        ).alias("rel_day"),
    )
    looks = spark.createDataFrame(
        [(1, 6), (2, 13), (3, 20), (4, 29)], "k int, last_day bigint"
    )
    cum = (
        e.join(F.broadcast(looks), F.col("rel_day") <= F.col("last_day"))
        .groupBy("k", "last_day")
        .agg(
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(
                F.when(F.col("g") == 1, F.col("conv")).otherwise(0)
            ).alias("x1"),
            F.sum(
                F.when(F.col("g") == 0, F.col("conv")).otherwise(0)
            ).alias("x0"),
        )
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p0 = F.col("x0").cast("double") / F.col("n0")
    pp = (F.col("x1") + F.col("x0")).cast("double") / (
        F.col("n1") + F.col("n0")
    )
    zv = (p1 - p0) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n0"))
    )
    bounds = spark.createDataFrame(
        list(_OBF_BOUNDS), "k int, bound double"
    )
    return (
        cum.withColumn("zval", zv)
        .join(F.broadcast(bounds), "k")
        .select(
            F.col("k").alias("look"),
            "last_day",
            "n1",
            "n0",
            "x1",
            "x0",
            F.round("zval", 6).alias("z"),
            "bound",
            F.when(F.abs(F.col("zval")) >= F.col("bound"), 1)
            .otherwise(0)
            .alias("reject"),
        )
        .orderBy("look")
    )


def _huber_oracle(iters: int = 4) -> str:
    """Huber IRLS unrolled as MATERIALIZED CTEs over the distinct-value
    histogram: location starts at the (doubled) median, clip threshold
    t = 1.345·MAD (exact rational 1345/1000), weights
    w = min(K, t·K // |x−μ|) in fixed point K = 1e6, and each
    iteration's μ' = Σ(cnt·w·x·K) // Σ(cnt·w) is an exact integer
    floor — both engines replay identical integer updates."""
    steps = []
    for k in range(1, iters + 1):
        km = k - 1
        steps.append(
            f"""w{k} AS MATERIALIZED (
      SELECT g.cv, g.cnt,
        CASE WHEN abs(g.cv * 1000000 - m{km}.mu) <= t.tfp
             THEN 1000000
             ELSE CAST(t.tfp AS HUGEINT) * 1000000
                  // abs(g.cv * 1000000 - m{km}.mu) END AS w
      FROM g, m{km}, t
    ),
    m{k} AS MATERIALIZED (
      SELECT CAST(sum(CAST(cnt AS HUGEINT) * w * cv * 1000000)
                  // sum(CAST(cnt AS HUGEINT) * w) AS HUGEINT) AS mu
      FROM w{k}
    )"""
        )
    stepsql = ",\n    ".join(steps)
    return f"""
    WITH e AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cv FROM events
      WHERE value IS NOT NULL
    ),
    g AS (SELECT cv, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY cv),
    cum AS (SELECT cv, cnt, sum(cnt) OVER (ORDER BY cv) AS c FROM g),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g),
    med AS (
      SELECT max(CASE WHEN c - cnt < (nn.n + 1) // 2
                       AND (nn.n + 1) // 2 <= c THEN cv END)
           + max(CASE WHEN c - cnt < (nn.n + 2) // 2
                       AND (nn.n + 2) // 2 <= c THEN cv END) AS m2
      FROM cum, nn
    ),
    dev AS (
      SELECT abs(2 * g.cv - med.m2) AS d2, g.cnt FROM g, med
    ),
    dcum AS (
      SELECT d2, cnt, sum(cnt) OVER (ORDER BY d2) AS c FROM
        (SELECT d2, CAST(sum(cnt) AS BIGINT) AS cnt FROM dev GROUP BY d2)
    ),
    mad AS (
      SELECT max(CASE WHEN c - cnt < (nn.n + 1) // 2
                       AND (nn.n + 1) // 2 <= c THEN d2 END)
           + max(CASE WHEN c - cnt < (nn.n + 2) // 2
                       AND (nn.n + 2) // 2 <= c THEN d2 END) AS mad4
      FROM dcum, nn
    ),
    m0 AS (SELECT CAST(med.m2 AS HUGEINT) * 500000 AS mu FROM med),
    t AS (
      SELECT CAST(mad.mad4 AS HUGEINT) * 250000 * 1345 // 1000 AS tfp
      FROM mad
    ),
    {stepsql}
    SELECT nn.n,
      round(CAST(med.m2 AS DOUBLE) / 200.0, 6) AS median,
      round(CAST(mad.mad4 AS DOUBLE) / 400.0, 6) AS mad,
      round(CAST(m{iters}.mu AS DOUBLE) / 1e8, 6) AS huber_loc
    FROM nn, med, mad, m{iters}
    """


_HUBER_ITERS = 4


@register("huber_location_value", _huber_oracle(_HUBER_ITERS))
def q_huber_location_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of the location of `value` — the IRLS member
    of the robust-location family (median/trimmed/winsorized are
    order-stat members; Huber interpolates between mean efficiency
    and median robustness with the standard k = 1.345 clip at MAD
    scale). 4 fixed IRLS iterations from the exact median.

    Exactness: everything is fixed-point integer arithmetic on the
    distinct-value histogram — median and MAD via the DOUBLED order-
    stat trick (m2, mad4 = 4·MAD in quarter-centi-units), weights
    w = min(K, t·K // |x−μ|) with K = 1e6, and each iteration's
    μ' = Σ(cnt·w·x·K) // Σ(cnt·w) an exact HUGEINT/DECIMAL(38,0)
    floor — order-free sums, identical integer trajectories in both
    engines (the PageRank fixed-point discipline applied to IRLS).

    Scale shape: one corpus hash agg to the distinct-value histogram;
    the two-pass running sum finds median/MAD; each iteration is one
    reduce over the histogram with the 1-row μ broadcast — 4
    iterations, all on the tiny frame."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.round(F.col("value") * 100).cast("bigint").alias("cv"))
    )
    g = e.groupBy("cv").agg(F.count(F.lit(1)).alias("cnt"))
    cum = global_running_sum(g, ["cv"], "cnt", "c")
    nn = g.agg(F.sum("cnt").alias("n"))
    plo = F.expr("(n + 1) div 2")
    phi = F.expr("(n + 2) div 2")

    def doubled_median(cumdf, valcol):
        return cumdf.crossJoin(F.broadcast(nn)).agg(
            (
                F.max(
                    F.when(
                        (F.col("c") - F.col("cnt") < plo)
                        & (plo <= F.col("c")),
                        F.col(valcol),
                    )
                )
                + F.max(
                    F.when(
                        (F.col("c") - F.col("cnt") < phi)
                        & (phi <= F.col("c")),
                        F.col(valcol),
                    )
                )
            ).alias("m2")
        )

    med = doubled_median(cum, "cv")
    dev = (
        g.crossJoin(F.broadcast(med))
        .select(
            F.abs(2 * F.col("cv") - F.col("m2")).alias("d2"), "cnt"
        )
        .groupBy("d2")
        .agg(F.sum("cnt").alias("cnt"))
    )
    dcum = global_running_sum(dev, ["d2"], "cnt", "c")
    mad = doubled_median(dcum, "d2").withColumnRenamed("m2", "mad4")
    mu = med.select(
        (F.col("m2").cast("decimal(38,0)") * 500000).alias("mu")
    )
    t = mad.select(
        F.expr(
            "(CAST(mad4 AS DECIMAL(38,0)) * 250000 * 1345) div 1000"
        ).alias("tfp")
    )
    gk = g.crossJoin(F.broadcast(t))
    for _ in range(_HUBER_ITERS):
        wk = gk.crossJoin(F.broadcast(mu)).select(
            "cv",
            "cnt",
            "tfp",
            F.expr(
                "CASE WHEN abs(CAST(cv AS DECIMAL(38,0)) * 1000000 - mu)"
                " <= tfp THEN CAST(1000000 AS BIGINT)"
                " ELSE CAST((CAST(tfp AS DECIMAL(38,0)) * 1000000) div"
                " abs(CAST(cv AS DECIMAL(38,0)) * 1000000 - mu)"
                " AS BIGINT) END"
            ).alias("w"),
        )
        mu = wk.agg(
            F.expr(
                "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * w * cv * 1000000)"
                " div sum(CAST(cnt AS DECIMAL(38,0)) * w)"
                " AS DECIMAL(38,0))"
            ).alias("mu")
        )
    return (
        nn.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(mu))
        .select(
            "n",
            F.round(F.col("m2").cast("double") / F.lit(200.0), 6).alias(
                "median"
            ),
            F.round(
                F.col("mad4").cast("double") / F.lit(400.0), 6
            ).alias("mad"),
            F.round(
                F.col("mu").cast("string").cast("double") / F.lit(1e8), 6
            ).alias("huber_loc"),
        )
    )


@register(
    "spearman_matrix_daily_volumes",
    """
    WITH dv AS (
      SELECT event_type,
        epoch_ns(ts) // 1000 // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM dv),
    types AS (SELECT DISTINCT event_type FROM dv),
    grid AS (
      SELECT t.event_type, d.day, coalesce(dv.v, 0) AS v
      FROM types t CROSS JOIN days d
      LEFT JOIN dv ON dv.event_type = t.event_type AND dv.day = d.day
    ),
    gv AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS t
      FROM grid GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, v, t,
        sum(t) OVER (PARTITION BY event_type ORDER BY v) AS cum
      FROM gv
    ),
    r2 AS (
      SELECT event_type, v, 2 * (cum - t) + t + 1 AS rr FROM c
    ),
    ranked AS (
      SELECT g.event_type, g.day, r2.rr
      FROM grid g JOIN r2 ON r2.event_type = g.event_type AND r2.v = g.v
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(a.rr * b.rr) AS BIGINT) AS sab,
        CAST(sum(a.rr) AS BIGINT) AS sa, CAST(sum(b.rr) AS BIGINT) AS sb,
        CAST(sum(a.rr * a.rr) AS BIGINT) AS saa,
        CAST(sum(b.rr * b.rr) AS BIGINT) AS sbb
      FROM ranked a JOIN ranked b
        ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n,
      round((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
            / sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                   * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)),
            6) AS rho
    FROM pairs
    ORDER BY type_a, type_b
    """,
)
def q_spearman_matrix_daily_volumes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank-correlation MATRIX across the five event types'
    daily volume series (all 10 pairs) — the dependence screen a
    metrics platform runs before trusting one series as a proxy for
    another (spearman_value_vs_time correlates ONE series with time;
    this correlates the series with each other, rank-based so a heavy
    day can't dominate like Pearson).

    Exactness: the (type, day) grid zero-fills missing cells so every
    series has the same length; tie-averaged ranks use the DOUBLED
    2·below+t+1 form (exact BIGINTs, the mannwhitney discipline) via
    per-type cumulative counts over distinct volumes; each pair's ρ
    is one shared IEEE expression over six exact integer sums
    (doubling cancels). Day-level join aligns series positionally.

    Scale shape: one corpus hash agg to |types|·|days| cells; the
    rank machinery and the pair join live entirely on that tiny
    calendar-bounded frame (per-type windows over ≤|days| rows)."""
    ev = load_table(spark, sf_dir, "events")
    dv = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    days = dv.select("day").distinct()
    types = dv.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(
            dv.select(
                F.col("event_type").alias("_t"),
                F.col("day").alias("_d"),
                "v",
            ),
            (F.col("event_type") == F.col("_t"))
            & (F.col("day") == F.col("_d")),
            "left",
        )
        .select(
            "event_type", "day", F.coalesce(F.col("v"), F.lit(0)).alias("v")
        )
    )
    gv = grid.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("t"))
    from ..operators.ranking import global_running_sum

    c = global_running_sum(gv, ["event_type", "v"], "t", "gcum")
    tot = gv.groupBy("event_type").agg(F.sum("t").alias("nt"))
    a, b = tot.alias("a"), tot.alias("b")
    off = (
        a.join(
            F.broadcast(b),
            F.col("b.event_type") < F.col("a.event_type"),
            "left",
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.coalesce(F.sum("b.nt"), F.lit(0)).alias("off"))
    )
    r2 = (
        c.join(F.broadcast(off), "event_type")
        .select(
            F.col("event_type").alias("_rt"),
            F.col("v").alias("_rv"),
            (
                2 * (F.col("gcum") - F.col("off") - F.col("t"))
                + F.col("t")
                + 1
            ).alias("rr"),
        )
    )
    ranked = grid.join(
        F.broadcast(r2),
        (F.col("event_type") == F.col("_rt")) & (F.col("v") == F.col("_rv")),
    ).select("event_type", "day", "rr")
    ra, rb = ranked.alias("ra"), ranked.alias("rb")
    pairs = (
        ra.join(
            F.broadcast(rb),
            (F.col("ra.day") == F.col("rb.day"))
            & (F.col("ra.event_type") < F.col("rb.event_type")),
        )
        .groupBy(
            F.col("ra.event_type").alias("type_a"),
            F.col("rb.event_type").alias("type_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ra.rr") * F.col("rb.rr")).alias("sab"),
            F.sum(F.col("ra.rr")).alias("sa"),
            F.sum(F.col("rb.rr")).alias("sb"),
            F.sum(F.col("ra.rr") * F.col("ra.rr")).alias("saa"),
            F.sum(F.col("rb.rr") * F.col("rb.rr")).alias("sbb"),
        )
    )
    nd = F.col("n").cast("double")
    rho = (
        nd * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    ) / F.sqrt(
        (nd * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        * (nd * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
    )
    return pairs.select(
        "type_a", "type_b", "n", F.round(rho, 6).alias("rho")
    ).orderBy("type_a", "type_b")


@register(
    "ccf_click_purchase_leadlag",
    """
    WITH dv AS (
      SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    x AS (SELECT day, v AS xv FROM dv WHERE event_type = 'click'),
    y AS (SELECT day, v AS yv FROM dv WHERE event_type = 'purchase'),
    lags(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
    j AS (
      SELECT lags.lag, x.xv, y.yv
      FROM lags, x JOIN y ON y.day = x.day + lags.lag
    ),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
        CAST(sum(xv * yv) AS BIGINT) AS sxy,
        CAST(sum(xv * xv) AS BIGINT) AS sxx,
        CAST(sum(yv * yv) AS BIGINT) AS syy
      FROM j GROUP BY lag
    )
    SELECT lag, n,
      round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
            6) AS r
    FROM s ORDER BY lag
    """,
)
def q_ccf_click_purchase_leadlag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-correlation function between click and purchase daily
    volumes at lags −3..+3 — the LEAD-LAG companion to
    seasonality_autocorr's single-series view: a positive peak at
    lag k > 0 means clicks lead purchases by k days, the thing an
    attribution window is actually calibrated from.

    Exactness: per-lag Pearson r over the overlapping day range from
    six exact BIGINT sums (volumes ≤ ~1e4, products ≤ 1e8·|days| —
    far inside BIGINT), assembled in one shared IEEE tree per lag
    (round-6); the lag alignment is an integer day-offset equi-join.

    Scale shape: one corpus hash agg to the ≤2·|days| daily frame;
    the 7-row lags table broadcasts over it; everything downstream is
    7 rows."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    dv = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    x = dv.filter(F.col("event_type") == "click").select(
        "day", F.col("v").alias("xv")
    )
    y = dv.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("v").alias("yv")
    )
    lags = spark.createDataFrame([(l,) for l in range(-3, 4)], "lag int")
    j = x.crossJoin(F.broadcast(lags)).join(
        F.broadcast(y), F.col("yday") == F.col("day") + F.col("lag")
    )
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    r = (
        nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    ) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select("lag", "n", F.round(r, 6).alias("r")).orderBy("lag")


@register(
    "granger_click_to_purchase",
    """
    WITH dv AS (
      SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
        CAST(count(*) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    x AS (SELECT day, v AS xv FROM dv WHERE event_type = 'click'),
    y AS (SELECT day, v AS yv FROM dv WHERE event_type = 'purchase'),
    al AS (
      SELECT yt.yv AS yy, yl.yv AS y1, xl.xv AS xx
      FROM y yt JOIN y yl ON yl.day = yt.day - 1
      JOIN x xl ON xl.day = yt.day - 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(yy) AS BIGINT) AS sy, CAST(sum(y1) AS BIGINT) AS s1,
        CAST(sum(xx) AS BIGINT) AS sx,
        CAST(sum(y1 * y1) AS BIGINT) AS s11,
        CAST(sum(xx * xx) AS BIGINT) AS sxx,
        CAST(sum(y1 * xx) AS BIGINT) AS s1x,
        CAST(sum(yy * y1) AS BIGINT) AS sy1,
        CAST(sum(yy * xx) AS BIGINT) AS syx,
        CAST(sum(yy * yy) AS BIGINT) AS syy
      FROM al
    ),
    c AS (
      SELECT n,
        CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1 AS c11,
        CAST(n AS DOUBLE) * s1x - CAST(s1 AS DOUBLE) * sx AS c1x,
        CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS cxx,
        CAST(n AS DOUBLE) * sy1 - CAST(s1 AS DOUBLE) * sy AS c1y,
        CAST(n AS DOUBLE) * syx - CAST(sx AS DOUBLE) * sy AS cxy,
        CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS cyy
      FROM s
    ),
    f AS (
      SELECT n, c11, c1x, cxx, c1y, cxy, cyy,
        c11 * cxx - c1x * c1x AS det,
        (c1y * cxx - cxy * c1x) / (c11 * cxx - c1x * c1x) AS b1,
        (c11 * cxy - c1x * c1y) / (c11 * cxx - c1x * c1x) AS bx
      FROM c
    )
    SELECT n,
      round(b1, 6) AS ar_coef,
      round(bx, 6) AS granger_coef,
      round(((cyy - c1y * c1y / c11) - (cyy - b1 * c1y - bx * cxy))
            * (n - 3) / (cyy - b1 * c1y - bx * cxy), 6) AS f_stat,
      CASE WHEN ((cyy - c1y * c1y / c11) - (cyy - b1 * c1y - bx * cxy))
                * (n - 3) / (cyy - b1 * c1y - bx * cxy) > 4.2252
           THEN 1 ELSE 0 END AS reject_f1_26_05
    FROM f
    """,
)
def q_granger_click_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lag-1 Granger causality test: does YESTERDAY's click volume
    predict today's purchase volume beyond purchase's own lag? F-test
    comparing the restricted AR(1) fit to the full model with the
    click lag — the directional, predictive complement to
    ccf_click_purchase_leadlag's symmetric correlation view (a CCF
    peak can be confounding; Granger conditions on the series' own
    history).

    Exactness: the nine sufficient sums are exact BIGINTs (daily
    volumes, all < 2^53 as doubles); both OLS fits assemble from them
    in ONE shared IEEE expression tree via centered cross-sums and
    Cramer's rule (the welch discipline — no per-row float work, no
    iterative solver), so the F statistic is bit-identical
    cross-engine. The F(1, 26) 5% critical value enters as a literal
    (the _BH_THRESHOLDS recipe; every SF spans exactly 30 days →
    n = 29 aligned rows).

    Scale shape: one corpus hash agg to the daily frame; lag
    alignment is two tiny self-joins; everything after is 1 row."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    dv = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    x = dv.filter(F.col("event_type") == "click").select(
        F.col("day").alias("xday"), F.col("v").alias("xx")
    )
    yt = dv.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("day"), F.col("v").alias("yy")
    )
    yl = dv.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("lday"), F.col("v").alias("y1")
    )
    al = yt.join(
        F.broadcast(yl), F.col("lday") == F.col("day") - 1
    ).join(F.broadcast(x), F.col("xday") == F.col("day") - 1)
    s = al.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yy").alias("sy"),
        F.sum("y1").alias("s1"),
        F.sum("xx").alias("sx"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("xx") * F.col("xx")).alias("sxx"),
        F.sum(F.col("y1") * F.col("xx")).alias("s1x"),
        F.sum(F.col("yy") * F.col("y1")).alias("sy1"),
        F.sum(F.col("yy") * F.col("xx")).alias("syx"),
        F.sum(F.col("yy") * F.col("yy")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    c11 = nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1")
    c1x = nd * F.col("s1x") - F.col("s1").cast("double") * F.col("sx")
    cxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    c1y = nd * F.col("sy1") - F.col("s1").cast("double") * F.col("sy")
    cxy = nd * F.col("syx") - F.col("sx").cast("double") * F.col("sy")
    cyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    det = c11 * cxx - c1x * c1x
    b1 = (c1y * cxx - cxy * c1x) / det
    bx = (c11 * cxy - c1x * c1y) / det
    rss_r = cyy - c1y * c1y / c11
    rss_f = cyy - b1 * c1y - bx * cxy
    fstat = (rss_r - rss_f) * (F.col("n") - 3) / rss_f
    return s.select(
        "n",
        F.round(b1, 6).alias("ar_coef"),
        F.round(bx, 6).alias("granger_coef"),
        F.round(fstat, 6).alias("f_stat"),
        F.when(fstat > 4.2252, 1).otherwise(0).alias("reject_f1_26_05"),
    )


#: shared oracle prefix: the conversion_surv construction + per-cohort
#: per-duration death/at-risk tables (the log-rank / Nelson-Aalen CTEs)
_SURV_ORACLE_PREFIX = """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type,
        CAST(round(value * 100) AS BIGINT) AS cv
      FROM events
    ),
    pur AS (
      SELECT * FROM e WHERE event_type = 'purchase' AND cv IS NOT NULL
    ),
    gv AS (SELECT cv, count(*) AS t FROM pur GROUP BY cv),
    cum AS (SELECT cv, t, sum(t) OVER (ORDER BY cv) AS c FROM gv),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pur),
    cut AS (
      SELECT min(cv) AS cut FROM cum, np WHERE c >= (9 * np.n + 9) // 10
    ),
    conv AS (
      SELECT user_id, min(us) AS tc
      FROM pur, cut WHERE pur.cv > cut.cut GROUP BY user_id
    ),
    peru AS (SELECT user_id, min(us) AS t0, max(us) AS tl FROM e GROUP BY 1),
    surv AS (
      SELECT peru.user_id % 2 AS g,
        (COALESCE(conv.tc, peru.tl) - peru.t0) // 86400000000 AS dur,
        CASE WHEN conv.tc IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM peru LEFT JOIN conv ON peru.user_id = conv.user_id
    ),
    cnt AS (
      SELECT g, dur, CAST(sum(ev) AS BIGINT) AS d,
        CAST(count(*) AS BIGINT) AS c
      FROM surv GROUP BY g, dur
    ),
    ar AS (
      SELECT d.g, d.dur, d.d, CAST(sum(c.c) AS BIGINT) AS n_at_risk
      FROM cnt d JOIN cnt c ON c.g = d.g AND c.dur >= d.dur
      WHERE d.d > 0
      GROUP BY 1, 2, 3
    )"""


def _km_oracle(max_steps: int = 30) -> str:
    """Kaplan-Meier product chain unrolled as MATERIALIZED CTEs: ranked
    death times per cohort, then `max_steps` fixed-point product steps
    S' = S·(n−d) // n (identity when a cohort has no rank-k death —
    idempotent past each cohort's last step, the kcore recipe); each
    step also EMITS its post-update row so the final union is the
    curve. 1e12 fixed point; every quotient an exact integer floor."""
    steps = []
    for k in range(1, max_steps + 1):
        km = k - 1
        steps.append(
            f"""s{k} AS MATERIALIZED (
      SELECT s.g,
        CASE WHEN r.n_at_risk IS NULL THEN s.sfp
             ELSE CAST(s.sfp AS HUGEINT) * (r.n_at_risk - r.d)
                  // r.n_at_risk END AS sfp
      FROM s{km} s LEFT JOIN rk r ON r.g = s.g AND r.rnk = {k}
    ),
    o{k} AS (
      SELECT r.g, r.dur, r.d, r.n_at_risk, s.sfp
      FROM rk r JOIN s{k} s ON s.g = r.g WHERE r.rnk = {k}
    )"""
        )
    stepsql = ",\n    ".join(steps)
    union = " UNION ALL ".join(
        f"SELECT * FROM o{k}" for k in range(1, max_steps + 1)
    )
    return (
        _SURV_ORACLE_PREFIX
        + f""",
    rk AS MATERIALIZED (
      SELECT g, dur, d, n_at_risk,
        ROW_NUMBER() OVER (PARTITION BY g ORDER BY dur) AS rnk
      FROM ar
    ),
    s0 AS (SELECT DISTINCT g, CAST(1000000000000 AS HUGEINT) AS sfp
           FROM rk),
    {stepsql}
    SELECT g, dur, d AS deaths, n_at_risk,
      CAST(sfp AS BIGINT) AS surv_fp,
      round(CAST(sfp AS DOUBLE) / 1e12, 6) AS survival
    FROM ({union})
    ORDER BY g, dur
    """
    )


@register("kaplan_meier_conversion_curve", _km_oracle(30))
def q_kaplan_meier_conversion_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival curves S(t) = Π(1 − dᵢ/nᵢ) per cohort on
    the shared conversion_surv frame — completing the survival trio
    (log-rank TEST, Nelson-Aalen HAZARD, KM CURVE): the step function
    a growth dashboard actually plots, with censoring handled
    correctly (kaplan_meier_retention draws uncensored retention;
    this is the censored-conversion estimator).

    Exactness: KM's sequential product is the one survival statistic
    SQL can't fold order-freely — so it runs as a FIXED-POINT product
    chain S' = S·(n−d) // n at 1e12 scale: exact integer floors with
    a pinned per-cohort time order. Spark executes the chain as
    driver Python ints over the COLLECTED per-cohort death table
    (≤ |days|·2 rows, calendar-bounded — the markov/MMR/PAVA
    precedent); the oracle unrolls 30 MATERIALIZED steps (identity
    when a cohort's deaths are exhausted — idempotent past the
    fixpoint, the kcore recipe), each step emitting its post-update
    row so the union IS the curve.

    Scale shape: corpus work is the per-user agg + the broadcast
    non-equi at-risk join (the Nelson-Aalen plan); the product chain
    touches ≤ 60 rows regardless of corpus size."""
    surv = conversion_surv(spark, sf_dir)
    cnt = surv.groupBy("g", "dur").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    d = cnt.filter(F.col("d") > 0).alias("d")
    c = cnt.alias("c")
    ar = (
        d.join(
            F.broadcast(c),
            (F.col("c.g") == F.col("d.g"))
            & (F.col("c.dur") >= F.col("d.dur")),
        )
        .groupBy(
            F.col("d.g").alias("g"),
            F.col("d.dur").alias("dur"),
            F.col("d.d").alias("deaths"),
        )
        .agg(F.sum(F.col("c.c")).alias("n_at_risk"))
    )
    rows = sorted(
        (
            (r["g"], r["dur"], r["deaths"], r["n_at_risk"])
            for r in ar.collect()
        ),
        key=lambda t: (t[0], t[1]),
    )
    # The oracle unrolls exactly 30 MATERIALIZED product steps; if any
    # cohort ever had MORE distinct death durations the oracle would
    # silently truncate its curve while this loop kept going. Fail
    # loudly instead of diverging (fixtures span 30 days, so this is
    # an invariant check, not a data path).
    per_g: dict = {}
    for g, _dur, _dd, _n in rows:
        per_g[g] = per_g.get(g, 0) + 1
    if per_g and max(per_g.values()) > 30:
        raise ValueError(
            "kaplan_meier_conversion_curve: a cohort has "
            f"{max(per_g.values())} death times but the oracle unrolls "
            "only 30 product steps — raise _km_oracle(n)"
        )
    out = []
    sfp = {}
    for g, dur, dd, n in rows:
        s = sfp.get(g, 10**12)
        s = s * (n - dd) // n
        sfp[g] = s
        out.append((g, dur, dd, n, s))
    return spark.createDataFrame(
        out,
        "g bigint, dur bigint, deaths bigint, n_at_risk bigint, "
        "surv_fp bigint",
    ).select(
        "*",
        F.round(F.col("surv_fp").cast("double") / F.lit(1e12), 6).alias(
            "survival"
        ),
    ).orderBy("g", "dur")


@register(
    "mantel_haenszel_urgent_fulfilled",
    """
    WITH o AS (
      SELECT c.c_nationkey AS s,
        CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
        CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    tab AS (
      SELECT s,
        CAST(sum(tr * y) AS BIGINT) AS a,
        CAST(sum(tr * (1 - y)) AS BIGINT) AS b,
        CAST(sum((1 - tr) * y) AS BIGINT) AS c,
        CAST(sum((1 - tr) * (1 - y)) AS BIGINT) AS d
      FROM o GROUP BY s
    ),
    ok AS (
      SELECT *, a + b + c + d AS n FROM tab
      WHERE a + b > 0 AND c + d > 0 AND n > 1
    ),
    terms AS (
      SELECT
        CAST(a AS HUGEINT) * d * 1000000000 // n AS adf,
        CAST(b AS HUGEINT) * c * 1000000000 // n AS bcf,
        a,
        CAST((a + b) AS HUGEINT) * (a + c) * 1000000000 // n AS ef,
        CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
          * 1000000000
          // (CAST(n AS HUGEINT) * n * (n - 1)) AS vf
      FROM ok
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
        CAST(CAST(sum(adf) AS VARCHAR) AS DOUBLE) AS sad,
        CAST(CAST(sum(bcf) AS VARCHAR) AS DOUBLE) AS sbc,
        CAST(sum(a) AS BIGINT) AS sa,
        CAST(CAST(sum(ef) AS VARCHAR) AS DOUBLE) AS se,
        CAST(CAST(sum(vf) AS VARCHAR) AS DOUBLE) AS sv
      FROM terms
    )
    SELECT n_strata,
      round(sad / sbc, 6) AS mh_or,
      round((sa - se / 1e9) * (sa - se / 1e9) / (sv / 1e9), 6)
        AS cmh_chi2
    FROM agg
    """,
)
def q_mantel_haenszel_urgent_fulfilled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio + Cochran-Mantel-Haenszel χ²
    for urgent-priority → fulfilled-status across nation strata — the
    ODDS-RATIO pooling companion to stratified_ate_urgent_orders'
    risk-difference view (MH weights each stratum by b·c/n, the
    epidemiology standard when strata sizes vary; CMH is its test).

    Exactness: per-stratum 2×2 cells are exact BIGINTs; the MH
    numerator/denominator and the CMH E/V accumulate ×1e9 with exact
    integer floor division per stratum (HUGEINT // ↔ DECIMAL(38,0)
    div — the log-rank per-term discipline), summed order-free and
    crossed to double via STRING. Two final divisions.

    Scale shape: one broadcast customer-dim join, one hash agg to
    |nations| strata, then 25-row arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    base = o.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_nationkey").alias("s"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("tr"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    tab = base.groupBy("s").agg(
        F.sum(F.col("tr") * F.col("y")).alias("a"),
        F.sum(F.col("tr") * (1 - F.col("y"))).alias("b"),
        F.sum((1 - F.col("tr")) * F.col("y")).alias("c"),
        F.sum((1 - F.col("tr")) * (1 - F.col("y"))).alias("d"),
    )
    ok = tab.withColumn(
        "n", F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ).filter(
        (F.col("a") + F.col("b") > 0)
        & (F.col("c") + F.col("d") > 0)
        & (F.col("n") > 1)
    )
    terms = ok.select(
        F.expr(
            "(CAST(a AS DECIMAL(38,0)) * d * 1000000000) div n"
        ).alias("adf"),
        F.expr(
            "(CAST(b AS DECIMAL(38,0)) * c * 1000000000) div n"
        ).alias("bcf"),
        "a",
        F.expr(
            "(CAST(a + b AS DECIMAL(38,0)) * (a + c) * 1000000000) div n"
        ).alias("ef"),
        F.expr(
            "(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)"
            " * 1000000000) div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
        ).alias("vf"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.col("adf").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("sad"),
        F.sum(F.col("bcf").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("sbc"),
        F.sum("a").alias("sa"),
        F.sum(F.col("ef").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("se"),
        F.sum(F.col("vf").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("sv"),
    )
    diff = F.col("sa") - F.col("se") / F.lit(1e9)
    return agg.select(
        "n_strata",
        F.round(F.col("sad") / F.col("sbc"), 6).alias("mh_or"),
        F.round(diff * diff / (F.col("sv") / F.lit(1e9)), 6).alias(
            "cmh_chi2"
        ),
    )


#: BH step-up z-thresholds for m=10 two-sided tests at α=0.05
#: (Dunn's 5-choose-2 pairs): thr_k = Φ⁻¹(1 − k·α/(2m)), precomputed
#: (statistics.NormalDist) — the _BH_THRESHOLDS recipe at m=10.
_BH10_THRESHOLDS = (
    (1, 2.807033768),
    (2, 2.575829304),
    (3, 2.432379059),
    (4, 2.326347874),
    (5, 2.241402728),
    (6, 2.170090378),
    (7, 2.108358399),
    (8, 2.053748911),
    (9, 2.004654462),
    (10, 1.959963985),
)

_BH10_THR_SQL = "VALUES " + ", ".join(
    f"({k}, CAST({t} AS DOUBLE))" for k, t in _BH10_THRESHOLDS
)


@register(
    "dunn_posthoc_value_pairs",
    f"""
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    gv AS (SELECT cv, CAST(count(*) AS BIGINT) AS t FROM e GROUP BY cv),
    cum AS (
      SELECT cv, t, sum(t) OVER (ORDER BY cv) AS c FROM gv
    ),
    r2 AS (SELECT cv, 2 * (c - t) + t + 1 AS rr FROM cum),
    pt AS (
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(r2.rr) AS BIGINT) AS s
      FROM e JOIN r2 USING (cv) GROUP BY e.event_type
    ),
    tot AS (
      SELECT CAST(sum(t) AS BIGINT) AS nn,
        CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
      FROM gv
    ),
    z AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        a.n AS n_a, b.n AS n_b,
        ((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n) / 2.0)
        / sqrt((CAST(tot.nn AS DOUBLE) * (tot.nn + 1) / 12.0
                - CAST(CAST(tot.ties AS VARCHAR) AS DOUBLE)
                  / (12.0 * (tot.nn - 1)))
               * (1.0 / a.n + 1.0 / b.n)) AS zval
      FROM pt a JOIN pt b ON a.event_type < b.event_type, tot
    ),
    ranked AS (
      SELECT type_a, type_b, n_a, n_b, zval,
        CAST(row_number() OVER (
          ORDER BY abs(zval) DESC, type_a ASC, type_b ASC) AS BIGINT)
          AS p_rank
      FROM z
    ),
    thr(k, thr) AS ({_BH10_THR_SQL}),
    cutoff AS (
      SELECT coalesce(max(r.p_rank), 0) AS kmax
      FROM ranked r JOIN thr ON thr.k = r.p_rank
      WHERE abs(r.zval) >= thr.thr
    )
    SELECT r.type_a, r.type_b, r.n_a, r.n_b,
      round(r.zval, 6) AS z, r.p_rank,
      r.p_rank <= cutoff.kmax AS rejected
    FROM ranked r, cutoff
    ORDER BY r.p_rank
    """,
)
def q_dunn_posthoc_value_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after Kruskal-Wallis, BH
    step-up corrected at α=0.05 over the 10 type pairs —
    kruskal_wallis_value_by_type says the five `value` distributions
    are not all equal; Dunn says WHICH pairs differ, on the same
    pooled-rank scale (pairwise Mann-Whitney tests use pair-local
    ranks and break the KW guarantee; Dunn is the correct follow-up).

    Exactness: pooled DOUBLED tie-average ranks (2·below+t+1, exact
    BIGINT via the two-pass cumulative machinery, no type partition);
    per-type doubled rank sums S_i and the pooled tie term Σ(t³−t)
    are exact integer/decimal aggregates; each pair's z is ONE shared
    IEEE tree (the /2 undoubles the mean difference); the 10 BH
    thresholds are Python-precomputed literals (_BH10_THRESHOLDS) —
    no runtime inverse-normal, and the step-up kmax is a rank-join
    max, exactly the BH rule.

    Scale shape: one corpus hash agg to distinct pooled values, the
    two-pass running sum, one per-(type, value)-free join back
    (broadcast r2 onto the corpus rows then a 5-row agg), and 10-row
    arithmetic."""
    from ..operators.ranking import global_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cv"),
        )
    )
    gv = e.groupBy("cv").agg(F.count(F.lit(1)).alias("t"))
    cum = global_running_sum(gv, ["cv"], "t", "c")
    r2 = cum.select(
        F.col("cv").alias("_cv"),
        (2 * (F.col("c") - F.col("t")) + F.col("t") + 1).alias("rr"),
    )
    pt = (
        e.join(F.broadcast(r2), F.col("cv") == F.col("_cv"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rr").alias("s"),
        )
    )
    tot = gv.agg(
        F.sum("t").alias("nn"),
        F.sum(
            (
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            )
        ).alias("ties"),
    )
    a, b = pt.alias("a"), pt.alias("b")
    z = (
        a.join(
            F.broadcast(b),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            (
                (
                    F.col("a.s").cast("double") / F.col("a.n")
                    - F.col("b.s").cast("double") / F.col("b.n")
                )
                / F.lit(2.0)
                / F.sqrt(
                    (
                        F.col("nn").cast("double")
                        * (F.col("nn") + 1)
                        / F.lit(12.0)
                        - F.col("ties").cast("string").cast("double")
                        / (F.lit(12.0) * (F.col("nn") - 1))
                    )
                    * (
                        F.lit(1.0) / F.col("n_a")
                        + F.lit(1.0) / F.col("n_b")
                    )
                )
            ).alias("zval"),
        )
    )
    w = Window.orderBy(
        F.abs(F.col("zval")).desc(), F.asc("type_a"), F.asc("type_b")
    )
    ranked = z.withColumn(
        "p_rank", F.row_number().over(w).cast("bigint")
    )
    thr = spark.createDataFrame(
        list(_BH10_THRESHOLDS), "k long, thr double"
    )
    cutoff = (
        ranked.join(F.broadcast(thr), F.col("p_rank") == F.col("k"))
        .filter(F.abs(F.col("zval")) >= F.col("thr"))
        .agg(F.coalesce(F.max("p_rank"), F.lit(0)).alias("kmax"))
    )
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.round("zval", 6).alias("z"),
            "p_rank",
            (F.col("p_rank") <= F.col("kmax")).alias("rejected"),
        )
        .orderBy("p_rank")
    )
