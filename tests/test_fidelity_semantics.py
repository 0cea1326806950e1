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
