"""Property-based certification of the r9 stats queries: the
REGISTERED plans (run on a generated parquet sf-dir, exactly as the
driver would) must match independent pure-Python replicas on
ARBITRARY data — the flagship/PAVA property-test discipline applied
to Wasserstein-1 and the log-rank test. Values are generated as exact
centi-units so the cv = round(100·value) quantization is unambiguous
in every runtime (Python round is banker's; the engines are HALF_UP —
generating from ints sidesteps the difference entirely)."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
    REGISTRY,
)


def _round6(x: float) -> float:
    return float(
        Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _write_events(tmpdir, rows):
    """rows: (user_id, ts_us, event_type, cv_int) -> events.parquet."""
    tbl = pa.table(
        {
            "user_id": pa.array(
                [r[0] for r in rows], type=pa.int64()
            ),
            "ts": pa.array(
                [r[1] for r in rows], type=pa.timestamp("us")
            ),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array(
                [r[3] / 100.0 for r in rows], type=pa.float64()
            ),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return str(tmpdir)


_cv = st.integers(min_value=0, max_value=50000)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    clicks=st.lists(_cv, min_size=1, max_size=40),
    views=st.lists(_cv, min_size=1, max_size=40),
)
def test_wasserstein_query_matches_python_replica(
    spark, tmp_path_factory, clicks, views
):
    """W1 between arbitrary click/view value samples: the registered
    plan equals the direct pure-integer formula
    Σ|c1cum·n2 − c2cum·n1|·Δcv / (n1·n2·100)."""
    assume(len(set(clicks) | set(views)) >= 2)
    rows = [
        (i, 1_700_000_000_000_000 + i * 60_000_000, "click", cv)
        for i, cv in enumerate(clicks)
    ] + [
        (1000 + i, 1_700_000_000_000_000 + i * 60_000_000, "view", cv)
        for i, cv in enumerate(views)
    ]
    d = _write_events(tmp_path_factory.mktemp("w1"), rows)
    fn, _ = REGISTRY["wasserstein_click_vs_view"]
    got = fn(spark, d).collect()[0]

    n1, n2 = len(clicks), len(views)
    vals = sorted(set(clicks) | set(views))
    c1 = c2 = 0
    wfp = 0
    for v, nxt in zip(vals, vals[1:]):
        c1 += sum(1 for x in clicks if x == v)
        c2 += sum(1 for x in views if x == v)
        wfp += abs(c1 * n2 - c2 * n1) * (nxt - v)
    w1 = float(wfp) / (n1 * n2 * 100.0)
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["n_values"] == len(vals)
    assert got["w1"] == _round6(w1)


@pytest.mark.slow  # r13 verify-window: depth replica; log_rank oracle parity stays fast
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 11),  # user
            st.integers(0, 25),  # day offset
            st.sampled_from(["view", "click", "purchase"]),
            _cv,
        ),
        min_size=30,
        max_size=120,
    )
)
def test_log_rank_query_matches_python_replica(
    spark, tmp_path_factory, evs
):
    """Log-rank on arbitrary per-user event streams: the registered
    plan equals a pure-Python-int replica of the spec (order-stat
    conversion cut, censoring at last event, per-term ×1e12 floor
    divisions)."""
    rows = [
        (u, 1_700_000_000_000_000 + d * 86_400_000_000 + i, t, cv)
        for i, (u, d, t, cv) in enumerate(evs)
    ]
    purchases = [(u, ts, cv) for (u, ts, t, cv) in rows if t == "purchase"]
    assume(len(purchases) >= 3)

    # python replica
    pcv = sorted(cv for _, _, cv in purchases)
    npur = len(pcv)
    p = (9 * npur + 9) // 10
    cut = pcv[p - 1]  # min cv with cum >= p over sorted distincts ==
    # p-th smallest overall (duplicates collapse consistently)
    conv = {}
    for u, ts, cv in purchases:
        if cv > cut:
            conv[u] = min(conv.get(u, ts), ts)
    t0, tl = {}, {}
    for u, ts, _, _ in rows:
        t0[u] = min(t0.get(u, ts), ts)
        tl[u] = max(tl.get(u, ts), ts)
    surv = []
    for u in t0:
        end = conv.get(u, tl[u])
        surv.append((u % 2, (end - t0[u]) // 86_400_000_000, u in conv))
    cnt = {}
    for g, dur, ev in surv:
        c = cnt.setdefault(dur, [0, 0, 0, 0])  # d1 d0 c1 c0
        if ev:
            c[0 if g == 1 else 1] += 1
        c[2 if g == 1 else 3] += 1
    o1 = e1s = vs = 0
    for dur, (d1, d0, _, _) in cnt.items():
        if d1 + d0 == 0:
            continue
        n1 = sum(c[2] for dd, c in cnt.items() if dd >= dur)
        n0 = sum(c[3] for dd, c in cnt.items() if dd >= dur)
        dd, n = d1 + d0, n1 + n0
        o1 += d1
        e1s += dd * n1 * 10**12 // n
        if n > 1:
            vs += (
                dd * n1 * n0 * (n - dd) * 10**12
                // (n * n * (n - 1))
            )
    assume(vs > 0)
    e1 = float(e1s) / 1e12
    v1 = float(vs) / 1e12
    z = (o1 - e1) / math.sqrt(v1)

    d = _write_events(tmp_path_factory.mktemp("lr"), rows)
    fn, _ = REGISTRY["log_rank_conversion_survival"]
    got = fn(spark, d).collect()[0]
    assert got["n_conv"] == len(conv)
    assert got["o1"] == o1
    assert got["e1"] == _round6(e1)
    assert got["var1"] == _round6(v1)
    assert got["z"] == _round6(z)


def test_kendalls_w_perfect_concordance_is_one(
    spark, tmp_path_factory
):
    """ADVICE r10 (high): the W numerator under-scaled the doubled
    rank-sum-of-squares term by 4, so perfect agreement yielded
    W = -3.5 on this fixture instead of 1.0. Pin the repaired
    formula: k=3 event types all rank n=4 days identically (day d
    gets d+1 events for every type, no ties) -> W must be exactly 1;
    by hand: sr2 = 6^2+12^2+18^2+24^2 = 1080,
    W = (12*1080 - 12*9*4*25) / (4*(9*4*15 - 0)) = 2160/2160 = 1."""
    day_us = 86_400_000_000
    base = 1_709_251_200_000_000  # 2024-03-01 UTC in micros
    rows = []
    eid = 0
    for t in ("a", "b", "c"):
        for d in range(4):
            for _ in range(d + 1):
                rows.append((eid, base + d * day_us, t, 100))
                eid += 1
    d = _write_events(tmp_path_factory.mktemp("kw"), rows)
    fn, _ = REGISTRY["kendalls_w_type_day_concordance"]
    got = fn(spark, d).collect()[0]
    assert (got["n"], got["k"]) == (4, 3)
    assert got["w"] == 1.0


def test_hilbert_transform_bijection_unit_steps(spark):
    """The unrolled xy2d rounds (shared verbatim with the DuckDB
    oracle) must produce a true Hilbert curve on the full 256x256
    grid: d is a bijection onto [0, 65536) and consecutive d values
    are unit Manhattan steps — the two properties that uniquely pin
    the curve, so any transcription slip in the CASE logic fails
    here rather than surviving parity (both engines share the same
    expression text, so driver parity alone cannot catch it)."""
    from pyspark.sql import functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.stats_r12 import (
        _HILBERT_N,
        _hilbert_round_exprs,
    )

    n = _HILBERT_N
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("bigint").alias("cell_x"),
            (F.col("id") / n).cast("bigint").alias("cell_y"),
        )
        .selectExpr(
            "cell_x",
            "cell_y",
            "cell_x AS x",
            "cell_y AS y",
            "CAST(0 AS BIGINT) AS d",
        )
    )
    for s in [128, 64, 32, 16, 8, 4, 2, 1]:
        grid = grid.selectExpr("cell_x", "cell_y", *_hilbert_round_exprs(s))
    rows = grid.selectExpr("cell_x", "cell_y", "d").collect()
    by_d = {r.d: (r.cell_x, r.cell_y) for r in rows}
    assert len(by_d) == n * n
    assert min(by_d) == 0 and max(by_d) == n * n - 1
    for d in range(n * n - 1):
        x1, y1 = by_d[d]
        x2, y2 = by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, x1, y1, x2, y2)
