"""Regression tests for the reference's subtle semantics (SURVEY.md
§7.4 watch list): case-insensitive resolution, numerics-as-strings,
zSetEntries[0] lossiness, schema-on-read nulls.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators import (
    decode,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.schemas import (
    REDIS_ENVELOPE,
    STEDI_EVENT,
)


def _envelope_df(spark, elements):
    """DataFrame with declared camelCase zSetEntries."""
    rows = [([(e, "1.0") for e in elements],)]
    return spark.createDataFrame(
        rows, "zSetEntries array<struct<element string, Score string>>"
    )


def test_case_insensitive_resolution(spark):
    """The reference declares `zSetEntries` but queries `zsetEntries`
    (sparkpykafkajoin.py:13,79) — legal only with the default
    spark.sql.caseSensitive=false. first_zset_element depends on it."""
    df = _envelope_df(spark, ["AAA", "BBB"])
    out = decode.first_zset_element(df).collect()
    assert [r.encodedCustomer for r in out] == ["AAA"]


def test_zset_entry_zero_drops_rest(spark):
    """F7 fidelity: only entry [0] is consumed — multi-entry zadds lose
    data (the documented reference lossiness); explode keeps all."""
    df = _envelope_df(spark, ["AAA", "BBB", "CCC"])
    assert decode.first_zset_element(df).count() == 1
    assert decode.explode_zset_elements(df).count() == 3


def test_score_stays_string(spark):
    """§1.2: score is STRING in the fidelity schema; '28.5' round-trips
    without numeric coercion."""
    df = spark.createDataFrame(
        [('{"customer":"x","score":"28.5","riskDate":"2020-01-01T00:00:00Z"}',)],
        "value string",
    )
    parsed = decode.parse_json(df, "value", STEDI_EVENT)
    row = parsed.collect()[0]
    assert row.score == "28.5" and isinstance(row.score, str)


def test_schema_on_read_nulls(spark):
    """Missing JSON fields parse to null (schema-on-read), which the
    null-filter then drops — the mechanism that rejects non-Customer
    changefeed rows."""
    df = spark.createDataFrame(
        [
            ('{"customerName":"A","email":"a@t.com","phone":"1","birthDay":"1990-01-01"}',),
            ('{"amount": 4.5}',),  # foreign payload: all fields null
            ("not json",),  # unparseable: whole struct null
        ],
        "value string",
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.schemas import (
        CUSTOMER,
    )

    parsed = df.withColumn("c", F.from_json("value", CUSTOMER)).select("c.*")
    valid = decode.non_null_customers(parsed)
    assert parsed.count() == 3
    assert valid.count() == 1
    assert valid.collect()[0].email == "a@t.com"


def test_envelope_schema_shape():
    """The fidelity schema matches the reference's declaration
    (sparkpykafkajoin.py:8-17) field-for-field."""
    names = [f.name for f in REDIS_ENVELOPE.fields]
    assert names == ["key", "existType", "Ch", "Incr", "zSetEntries"]
    entry = REDIS_ENVELOPE["zSetEntries"].dataType.elementType
    assert [f.name for f in entry.fields] == ["element", "Score"]
    assert entry["Score"].dataType.simpleString() == "string"  # §1.2


def test_risk_alert_bursts_planted_burst(spark, tmp_path):
    """De-vacuify risk_alert_bursts (r8, VERDICT r7 #2): at the old
    threshold both Spark and the oracle returned 0 rows, so the hash
    match proved nothing. Plant the decisive fixtures directly:
    - user 1: THREE high readings inside one hour -> exactly one
      alerting row, n_alerts counts the 3rd reading onward (here the
      3rd and a 4th still in-window => 2 alerts),
    - user 2: two high readings in an hour (control) -> silent,
    - user 3: three high readings spread over 3 hours (never 3 within
      a trailing hour) -> silent,
    - low readings interleaved everywhere -> ignored by the filter.
    """
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
        REGISTRY,
    )

    rows = []

    def ev(i, user, minute, value, hour=10):
        rows.append(
            (i, f"2024-03-01 {hour:02d}:{minute:02d}:00", user, "risk", value, "{}")
        )

    # user 1: burst — 10:00, 10:10, 10:20 (3rd alerts), 10:50 (4th, the
    # trailing hour still holds all four -> alerts too)
    ev(1, 1, 0, 75.0)
    ev(2, 1, 10, 80.0)
    ev(3, 1, 20, 90.0)
    ev(4, 1, 50, 95.0)
    # user 1 low readings: must not count
    ev(5, 1, 5, 10.0)
    ev(6, 1, 15, 20.0)
    # user 2: only two highs in the hour -> no alert
    ev(7, 2, 0, 70.0)
    ev(8, 2, 30, 71.0)
    # user 3: three highs but 2h apart -> no trailing hour holds 3
    ev(9, 3, 0, 60.0, hour=8)
    ev(10, 3, 0, 61.0, hour=10)
    ev(11, 3, 0, 62.0, hour=12)

    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    fn, _ = REGISTRY["risk_alert_bursts"]
    got = {r.user_id: r for r in fn(spark, str(tmp_path)).collect()}
    assert set(got) == {1}, "only the planted burst user may alert"
    r = got[1]
    assert r.n_alerts == 2  # the 3rd (10:20) and 4th (10:50) readings
    first = spark.sql(
        "SELECT unix_micros(timestamp'2024-03-01 10:20:00') AS us"
    ).collect()[0].us
    last = spark.sql(
        "SELECT unix_micros(timestamp'2024-03-01 10:50:00') AS us"
    ).collect()[0].us
    assert (r.first_alert_us, r.last_alert_us) == (first, last)
