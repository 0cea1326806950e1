"""Property-based test: for ARBITRARY customer/risk payloads, the
flagship pipeline's batch output equals a pure-Python model of the
reference's semantics (decode → null-filter → birthYear → inner join).
"""

import base64
import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans import (
    pipelines,
)

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), min_size=1, max_size=12
)
_email_nn = _name.map(lambda s: f"{s}@test.com")
_email = st.one_of(st.none(), _email_nn)
_birthday = st.one_of(
    st.none(),
    st.tuples(
        st.integers(1900, 2020), st.integers(1, 12), st.integers(1, 28)
    ).map(lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}"),
)
_customer = st.fixed_dictionaries(
    {"customerName": _name, "email": _email, "phone": _name, "birthDay": _birthday}
)
_score = st.integers(-1000, 1000).map(lambda i: str(i / 10))
# draw the non-null branch directly: filtering half-None draws away
# multiplied across 8-element lists occasionally tripped Hypothesis'
# filter_too_much health check under a loaded full-suite run
_risk = st.tuples(_email_nn, _score)


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def _envelope(cust: dict) -> tuple:
    return (
        _b64("Customer"),
        json.dumps(
            {
                "key": _b64("Customer"),
                "existType": "NONE",
                "Ch": False,
                "Incr": False,
                "zSetEntries": [{"element": _b64(json.dumps(cust)), "Score": "0.0"}],
            }
        ),
    )


def _model(customers: list[dict], risks: list[tuple]) -> set:
    """Pure-Python reference semantics."""
    out = set()
    for c in customers:
        if c["email"] is None or c["birthDay"] is None:
            continue
        birth_year = c["birthDay"].split("-")[0]
        for cust_email, score in risks:
            if cust_email == c["email"]:
                out.add((c["email"], birth_year, cust_email, score))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(st.lists(_customer, min_size=1, max_size=4), min_size=1, max_size=4))
def test_zset_explode_keeps_every_entry(spark, batches):
    """Property: the scale-mode explode path recovers EVERY customer
    from multi-entry zadd envelopes (fidelity [0] would drop all but
    the first)."""
    def multi_envelope(custs):
        return (
            _b64("Customer"),
            json.dumps(
                {
                    "key": _b64("Customer"),
                    "existType": "NONE",
                    "Ch": False,
                    "Incr": False,
                    "zSetEntries": [
                        {"element": _b64(json.dumps(c)), "Score": "0.0"} for c in custs
                    ],
                }
            ),
        )

    from pyspark.sql import functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators import (
        decode,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.schemas import (
        CUSTOMER,
        REDIS_ENVELOPE,
    )

    raw = spark.createDataFrame(
        [multi_envelope(b) for b in batches], "key string, value string"
    )
    env = decode.parse_json(decode.cast_kv_to_string(raw), "value", REDIS_ENVELOPE)
    exploded = decode.explode_zset_elements(env)
    parsed = exploded.withColumn(
        "c", F.from_json(decode.decode_base64_str("encodedCustomer"), CUSTOMER)
    ).select("c.*")
    got = sorted(
        (r.customerName, r.email) for r in parsed.collect()
    )
    expected = sorted((c["customerName"], c["email"]) for b in batches for c in b)
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        # Spark saturating the box slows Hypothesis' data generation
        # enough to trip too_slow under a full-suite run.
        HealthCheck.too_slow,
    ],
)
@given(
    customers=st.lists(_customer, min_size=0, max_size=8),
    risks=st.lists(_risk, min_size=0, max_size=8),
)
def test_flagship_matches_python_model(spark, customers, risks):
    kv = "key string, value string"
    redis_rows = [_envelope(c) for c in customers]
    event_rows = [
        (e, json.dumps({"customer": e, "score": s, "riskDate": "2020-01-01T00:00:00Z"}))
        for e, s in risks
    ]
    redis_df = spark.createDataFrame(redis_rows or [(None, None)], kv)
    events_df = spark.createDataFrame(event_rows or [(None, None)], kv)
    got = {
        (r.email, r.birthYear, r.customer, r.score)
        for r in pipelines.flagship_join_pipeline(redis_df, events_df).collect()
    }
    assert got == _model(customers, risks)


# --- chunking invariants (operators registered as chunk_documents) ---

_tokens = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_tokens, min_size=1, max_size=5))
def test_chunking_reconstructs_documents(spark, docs):
    """For ARBITRARY token lists: (1) concatenating each chunk's first
    `stride` tokens (entire last chunk) reproduces the document
    exactly; (2) every chunk except the last has exactly `window`
    tokens; (3) chunk ids are dense from 0. This is the contract that
    makes chunked training data lossless."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        _CHUNK_S,
        _CHUNK_W,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # replicate the registered query's exact expression pipeline over
    # these arbitrary docs (same _CHUNK_* constants)
    from pyspark.sql import functions as F2

    toks = df.select("doc_id", F2.split("text", " ").alias("t"))
    starts = toks.select(
        "doc_id", "t",
        F2.explode(F2.expr(f"sequence(0, size(t) - 1, {_CHUNK_S})")).alias("s"),
    )
    out = starts.select(
        "doc_id",
        F2.expr(f"s div {_CHUNK_S}").alias("chunk_id"),
        F2.expr(f"array_join(slice(t, s + 1, {_CHUNK_W}), ' ')").alias("chunk_text"),
        F2.least(F2.lit(_CHUNK_W), F2.size("t") - F2.col("s")).alias("n_chunk_tokens"),
    ).collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    for i, toks_i in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # every non-final chunk spans the full window
        for c in chunks[:-1]:
            assert c.n_chunk_tokens == min(_CHUNK_W, len(toks_i) - c.chunk_id * _CHUNK_S)
        # reconstruction: first `stride` tokens of each chunk + full tail
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:_CHUNK_S])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == toks_i, (i, rebuilt, toks_i)


_vocab = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
_doc_tokens = st.lists(_vocab, min_size=3, max_size=12)


@pytest.mark.slow  # r13 verify-window: depth property; oracle parity for
# setsim_prefix_filter_pairs + the non-binary-threshold test stay fast
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc_tokens, min_size=2, max_size=8))
def test_prefix_filter_lossless_on_arbitrary_corpora(spark, docs):
    """For ARBITRARY small corpora drawn from a tight vocabulary (so
    high-Jaccard pairs actually occur), the prefix-filtered join's
    output must equal brute-force all-pairs 3-gram Jaccard >= 0.5 in
    BOTH membership and values — the losslessness theorem checked on
    inputs nobody hand-picked, including pathological ones (identical
    docs, all-same-token docs, docs shorter than the shingle width)."""
    from pyspark.sql import functions as F2

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators import (
        dedup,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 12)
        for r in dedup.prefix_filter_near_dups(df, threshold=0.5).collect()
    }

    # brute force in pure Python (the shingle rule mirrors word_shingles:
    # docs shorter than the shingle width collapse to one whole-text shingle)
    def sset(toks):
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expected = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sset(docs[i]), sset(docs[j])
            jac = len(a & b) / len(a | b)
            if jac >= 0.5:
                expected[(i, j)] = round(jac, 12)
    assert got == expected
    spark.catalog.clearCache()


@pytest.mark.slow  # r13 verify-window: depth property; the systematic_pps
# oracle-parity check stays fast
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    weights=st.lists(st.integers(1, 500), min_size=1, max_size=40),
    k=st.sampled_from([1, 3, 17]),
)
def test_systematic_pps_exact_k_arbitrary_weights(spark, weights, k):
    """For ARBITRARY positive integer weights and sample sizes: the
    grid construction emits EXACTLY k picks (the core invariant —
    independent-draw samplers only achieve k in expectation), and no
    row is picked more than ceil(k*w/total) + 1 times (a row cannot
    contain more grid points than its rescaled width covers)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.sampling import (
        systematic_pps_sample,
    )

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n_chars long"
    )
    out = systematic_pps_sample(df, "n_chars", k).collect()
    total = sum(weights)
    assert sum(r.n_picks for r in out) == k
    for r in out:
        assert r.n_picks <= (k * r.weight) // total + 1
    spark.catalog.clearCache()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # s_extra
            st.integers(min_value=1, max_value=10**6),  # n
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_pava_leftmost_merge_equals_stack_pava(raw):
    """pava_pool_bins (leftmost-violator merge, the oracle's unrolled
    order) must produce the SAME pooling as the classical stack-based
    PAVA on arbitrary bin tables — the textbook order-invariance of
    the isotonic solution, certified with exact integer inputs
    (s clamped ≤ n so rates are valid)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.analytics import (
        pava_pool_bins,
    )

    bins = [
        (i, min(s, n), n) for i, (s, n) in enumerate(raw)
    ]

    # independent reference: stack-based PAVA (push each bin; merge
    # while the top two violate), exact cross-multiplied comparisons
    stack = []
    for b, s, n in bins:
        stack.append([b, s, n])
        while (
            len(stack) >= 2
            and stack[-2][1] * stack[-1][2] > stack[-1][1] * stack[-2][2]
        ):
            stack[-2][1] += stack[-1][1]
            stack[-2][2] += stack[-1][2]
            stack.pop()
    ref = {}
    for start, ps, pn in stack:
        ref[start] = (ps, pn)

    got = pava_pool_bins(bins)
    # same pool starts, same pooled sums
    got_pools = {}
    for b, n, s, start, ps, pn in got:
        got_pools[start] = (ps, pn)
    assert got_pools == ref
    # output is monotone non-decreasing by cross-multiplication
    rows = sorted(got, key=lambda t: t[0])
    for (_, _, _, _, ps1, pn1), (_, _, _, _, ps2, pn2) in zip(
        rows, rows[1:]
    ):
        assert ps1 * pn2 <= ps2 * pn1
    # pools partition the bins: per-pool sums equal member sums
    import collections

    member = collections.defaultdict(lambda: [0, 0])
    for b, n, s, start, ps, pn in got:
        member[start][0] += s
        member[start][1] += n
    for start, (ms, mn) in member.items():
        assert (ms, mn) == got_pools[start]
