"""Model-assisted curation: a weak-label quality classifier.

The heuristic quality signals in `operators.text` (repetition ratios,
token counts, stopword share) are per-rule filters; production corpora
(the fastText-filter pattern used for GPT-3/LLaMA-style pretraining
sets) train a cheap classifier on weak labels from those rules and
filter on the model's score instead, because the model generalizes past
the exact thresholds it was labeled with.

Spark-first shape: features are pure JVM expressions (single scan, no
Python), the label rule is a deterministic SQL predicate, training is
`pyspark.ml` LogisticRegression (distributed LBFGS — partial gradients
aggregated per partition, O(iterations) passes, no driver-side data),
and scoring is a broadcast of the coefficient vector back into JVM
expressions: the scored corpus never leaves whole-stage codegen, so the
filter composes with any downstream pipeline at full scan speed.

Non-SQL-expressible (iterative optimization) → the registry entry is
rows-only, like KMeans IVF; determinism (zero-init LBFGS, fixed data)
is covered by tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import repetition_stats, stopword_ratio, token_count

#: Feature columns the classifier trains on. Deliberately EXCLUDES
#: dup_bigram_ratio — the weak-label rule keys on it, and holding the
#: labeling signal out of the feature set is what makes the exercise
#: weak supervision rather than the model re-learning the threshold.
FEATURES = ("distinct_token_ratio", "top_token_share", "n_tokens", "stopword_ratio")


def quality_feature_frame(
    docs: DataFrame, col: str = "text", label_threshold: float = 0.2
) -> DataFrame:
    """One-scan JVM feature extraction + the weak label.

    Weak label (1 = low quality): duplicate-bigram fraction over
    `label_threshold` — the Gopher-style repetition rule. 0.2 is the
    literature operating point for genuinely spammy text (the planted
    fixtures in tests/test_models.py sit far above it); callers
    labeling a CLEAN corpus must calibrate the threshold to a quantile
    that actually splits it, or LBFGS degenerates on a constant label
    (intercept → ±inf, coefficients 0 — observed on the synthetic
    documents table, whose dup-bigram ratio maxes at 0.13). The label
    column rides along for training/eval; scoring paths can drop it."""
    reps = repetition_stats(col)
    return docs.select(
        "doc_id",
        reps["distinct_token_ratio"].alias("distinct_token_ratio"),
        reps["top_token_share"].alias("top_token_share"),
        token_count(col).cast("double").alias("n_tokens"),
        stopword_ratio(col).alias("stopword_ratio"),
        (reps["dup_bigram_ratio"] > label_threshold).cast("double").alias("weak_label"),
    )


def train_quality_classifier(feats: DataFrame, max_iter: int = 30, reg: float = 0.01):
    """Fit LogisticRegression(weak_label ~ FEATURES). Returns the fitted
    model. Deterministic: LBFGS from zero init on fixed data has no
    random state, so coefficients are reproducible run-to-run (asserted
    in tests)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg, labelCol="weak_label", featuresCol="features"
    )
    return lr.fit(va.transform(feats))


#: Serving-path coefficients frozen from a one-time LBFGS fit
#: (max_iter=15, reg=0.01, label_threshold=0.065) on the sf0.01
#: documents table — training is an offline job; SERVING is literal
#: arithmetic, so a deployed filter pins the exact model version as
#: code. Order matches FEATURES. Signs sanity-check the semantics:
#: repetitive docs (high top_token_share, low distinct ratio, few
#: stopwords) score high.
FROZEN_INTERCEPT = -3.24717046797201
FROZEN_COEFS = (
    -4.49582477894105,  # distinct_token_ratio
    19.967030975467523,  # top_token_share
    0.021812184602536196,  # n_tokens
    -3.383430552493673,  # stopword_ratio
)


def frozen_logit_expr(feature_cols: tuple[str, ...] = FEATURES) -> Column:
    """The frozen model's logit as a strict left-to-right fused chain:
    intercept + Σ coef·feature. Every op is IEEE double add/multiply —
    deterministic and bit-identical in any engine that evaluates the
    same textual order (the DuckDB oracle writes the identical chain),
    unlike sigmoid whose exp() is not correctly-rounded and may differ
    in the last ulp across libms. Filtering on the logit is equivalent:
    sigmoid is monotone, so p > t  ⟺  logit > ln(t/(1-t))."""
    z = F.lit(FROZEN_INTERCEPT)
    for c, name in zip(FROZEN_COEFS, feature_cols):
        z = z + F.lit(c) * F.col(name)
    return z


def score_expression(model, feature_cols: tuple[str, ...] = FEATURES) -> Column:
    """Broadcast the trained model back into a pure JVM expression:
    sigmoid(intercept + Σ coef·feature). At 100 TB this is the whole
    point — scoring is a handful of literal multiplies inside
    whole-stage codegen, not a per-row model invocation through Python
    or an ML transformer's UDF; the corpus-wide filter costs the same
    as any arithmetic projection."""
    coefs = list(model.coefficients)
    z = F.lit(float(model.intercept))
    for c, name in zip(coefs, feature_cols):
        z = z + F.lit(float(c)) * F.col(name)
    return 1.0 / (1.0 + F.exp(-z))


def score_quality(
    docs: DataFrame, model, col: str = "text", label_threshold: float = 0.2
) -> DataFrame:
    """Feature-extract + score in one composable projection; filter on
    `p_low_quality` downstream."""
    feats = quality_feature_frame(docs, col, label_threshold)
    return feats.withColumn(
        "p_low_quality", F.round(score_expression(model), 6)
    ).select("doc_id", "weak_label", "p_low_quality")
