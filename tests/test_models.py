"""Weak-label quality classifier: separation on planted data,
expression-vs-MLlib-transform parity, and training determinism."""

import pyspark.sql.functions as F
import pytest

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.models import (
    FEATURES,
    quality_feature_frame,
    score_expression,
    score_quality,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def planted(spark):
    """400 deterministic docs: half natural (distinct tokens, stopwords),
    half spam (one phrase repeated -> dup-bigram heavy)."""
    clean = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick value of row "),
            F.col("id").cast("string"),
            F.lit(" and a table with scan filter merge sort batch stream "),
            F.col("id").cast("string"),
            F.lit(" window"),
        ).alias("text"),
    )
    spam = spark.range(200, 400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.concat(F.lit("buy"), (F.col("id") % 3).cast("string")), 40)
        ).alias("text"),
    )
    return clean.unionByName(spam)


def test_classifier_separates_planted_holdout(spark, planted):
    feats = quality_feature_frame(planted).persist()
    train = feats.filter(F.xxhash64("doc_id") % 5 != 0)
    hold = feats.filter(F.xxhash64("doc_id") % 5 == 0)
    model = train_quality_classifier(train)
    scored = hold.withColumn("p", score_expression(model))
    rows = scored.select("doc_id", "weak_label", "p").collect()
    feats.unpersist()
    assert len(rows) > 30
    acc = sum(1 for r in rows if (r.p > 0.5) == (r.weak_label == 1.0)) / len(rows)
    assert acc >= 0.95, f"holdout accuracy {acc}"
    # the label rule fired on the planted halves as designed
    assert {r.weak_label for r in rows} == {0.0, 1.0}


def test_score_expression_matches_mllib_transform(spark, planted):
    """The broadcast sigmoid expression must reproduce MLlib's own
    probability output — the JVM scoring path is the model, not an
    approximation of it."""
    from pyspark.ml.feature import VectorAssembler

    feats = quality_feature_frame(planted)
    model = train_quality_classifier(feats)
    va = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    via_transform = {
        r.doc_id: float(r.probability[1])
        for r in model.transform(va.transform(feats)).select("doc_id", "probability").collect()
    }
    via_expr = {
        r.doc_id: r.p
        for r in feats.withColumn("p", score_expression(model)).select("doc_id", "p").collect()
    }
    assert via_transform.keys() == via_expr.keys()
    assert all(abs(via_transform[k] - via_expr[k]) < 1e-9 for k in via_expr)


def test_training_is_deterministic(spark, planted):
    feats = quality_feature_frame(planted)
    m1 = train_quality_classifier(feats)
    m2 = train_quality_classifier(feats)
    assert list(m1.coefficients) == list(m2.coefficients)
    assert m1.intercept == m2.intercept


def test_scored_frame_shape(spark, planted):
    feats = quality_feature_frame(planted)
    model = train_quality_classifier(feats)
    out = score_quality(planted, model)
    assert out.columns == ["doc_id", "weak_label", "p_low_quality"]
    sample = out.limit(5).collect()
    assert all(0.0 <= r.p_low_quality <= 1.0 for r in sample)


def test_bpe_train_hand_computed_merges(spark):
    """BPE loop certification on a corpus whose merge sequence is
    hand-computable. Corpus words: 'abab' ×3, 'abc' ×1.
    Round 1 pairs: (a,b):7 [2 per 'abab' ×3 + 1 in 'abc'], (b,a):3,
    (b,c):1 → merge ('a','b') → words: [ab,ab]×3, [ab,c].
    Round 2 pairs: (ab,ab):3, (ab,c):1 → merge ('ab','ab').
    Round 3: only (abab,?) none adjacent except [abab] and [ab,c]:
    (ab,c):1 → merge ('ab','c'). Vocabulary collapses accordingly."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.tokenizer import (
        bpe_train,
    )

    docs = spark.createDataFrame(
        [("abab abab abab abc",)], "text string"
    )
    merges, vocab = bpe_train(docs, n_merges=3)
    assert merges == [("a", "b"), ("ab", "ab"), ("ab", "c")], merges
    v = {r["symbol"]: r["count"] for r in vocab.collect()}
    assert v == {"abab": 3, "abc": 1}, v
    spark.catalog.clearCache()


def test_bpe_train_early_stop_on_single_symbols(spark):
    """When every word is one symbol, no pairs exist — the loop must
    stop early and return the char vocabulary."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.tokenizer import (
        bpe_train,
    )

    docs = spark.createDataFrame([("a b a c",)], "text string")
    merges, vocab = bpe_train(docs, n_merges=5)
    assert merges == []
    v = {r["symbol"]: r["count"] for r in vocab.collect()}
    assert v == {"a": 2, "b": 1, "c": 1}
    spark.catalog.clearCache()


def test_bpe_encode_applies_trained_merges(spark):
    """Encoding with the trained merges reproduces the training-corpus
    segmentation ('abab'→[abab], 'abc'→[abc]) and segments UNSEEN words
    by the same rules ('abd'→[ab,d] — only the learned merges apply)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    train_docs = spark.createDataFrame([("abab abab abab abc",)], "text string")
    merges, _ = bpe_train(train_docs, n_merges=3)
    enc = bpe_encode(
        spark.createDataFrame([("abab abc abd x",)], "text string"), merges
    )
    toks = enc.collect()[0]["tokens"]
    assert toks == ["abab", "abc", "ab", "d", "x"], toks
    spark.catalog.clearCache()


def test_bpe_encode_concat_invariant(spark):
    """For ANY merge list, concatenating a word's tokens must rebuild
    the word exactly (merges only group adjacent symbols — they never
    create, drop, or reorder characters), and no token may span a word
    boundary. Checked over a 200-word deterministic corpus with enough
    merges to produce multi-char tokens."""
    import pyspark.sql.functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    alphabet = "abcde"
    words = [
        "".join(alphabet[(i * 7 + j * 3) % len(alphabet)] for j in range(2 + i % 6))
        for i in range(200)
    ]
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    merges, _ = bpe_train(docs, n_merges=8)
    assert len(merges) == 8  # corpus is repetitive enough to find 8
    enc = bpe_encode(docs, merges)
    toks = enc.collect()[0]["tokens"]
    # word boundaries: greedily consume tokens to rebuild each word
    it = iter(toks)
    for w in words:
        built = ""
        while built != w:
            t = next(it)
            built += t
            assert w.startswith(built), (w, built)
    assert next(it, None) is None  # no leftover tokens
    spark.catalog.clearCache()


def test_quality_calibration_bins_invariants(spark):
    """Bin totals cover the corpus; flag/bin consistency (z>0 ⟺ flagged
    means bins ≥1 are fully flagged, bins ≤ −1 fully unflagged, only
    bin 0 may be mixed); label mass matches the corpus-wide weak-label
    count."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.models import (
        quality_feature_frame,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.analytics import (
        _QUALITY_LABEL_THRESHOLD,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["quality_calibration_bins"][0](spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    assert sum(r.n for r in rows) == docs.count()
    n_pos = (
        quality_feature_frame(docs, label_threshold=_QUALITY_LABEL_THRESHOLD)
        .agg(F.sum("weak_label"))
        .collect()[0][0]
    )
    assert sum(r.n_low_quality_label for r in rows) == int(n_pos)
    for r in rows:
        assert 0 <= r.n_low_quality_label <= r.n
        if r.logit_bin >= 1:
            assert r.n_flagged == r.n, r
        elif r.logit_bin <= -1:
            assert r.n_flagged == 0, r


def test_pca_top_component_matches_numpy_eigenvector(spark):
    """The fixed-point power iterate must align with the TRUE leading
    eigenvector of the quantized Gram matrix (numpy eigh, float64):
    |cosine| >= 0.999, and the Rayleigh quotient within 0.1% of the
    top eigenvalue — certifying the integer recurrence converges to
    the right direction, not merely deterministically."""
    import numpy as np

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["pca_top_component"][0](spark, sf).collect()
    v = np.array(
        [r.v_fp for r in sorted(rows, key=lambda r: r.pos)], dtype=np.float64
    )
    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, sf, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    q = np.round(emb * 1000)
    gram = q.T @ q
    w, vecs = np.linalg.eigh(gram)
    top = vecs[:, np.argmax(w)]
    cos = abs(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.999, cos
    # Rayleigh quotient vs the top eigenvalue of the quantized Gram
    ray = rows[0].rayleigh
    assert abs(ray - w.max()) / w.max() < 1e-3, (ray, w.max())
