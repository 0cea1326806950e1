"""Source/sink format twins: the same plan must run over parquet, CSV,
and JSON inputs (schema-on-read), and the partitioned-parquet batch
sink must round-trip with partition pruning.
"""

import os

from pyspark.sql import functions as F

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.operators.aggregates import (
    risk_calculation,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
    load_table,
    stream_table,
)

from conftest import SF_SMOKE


def _events_pdf(spark, n=200):
    return load_table(spark, SF_SMOKE, "events").limit(n).toPandas()


def test_same_plan_over_csv_and_json(spark, tmp_path):
    """risk_calculation over CSV and JSON twins of the events table
    produces identical results to the parquet original."""
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    expected = sorted(
        tuple(r) for r in risk_calculation(ev).select("user_id", "n_events").collect()
    )

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    ev.write.option("header", True).csv(csv_dir)
    ev.write.json(json_dir)

    csv_df = spark.read.option("header", True).schema("user_id bigint, value double").csv(csv_dir)
    json_df = spark.read.schema("user_id bigint, value double").json(json_dir)
    for twin in (csv_df, json_df):
        got = sorted(
            tuple(r)
            for r in risk_calculation(twin).select("user_id", "n_events").collect()
        )
        assert got == expected


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    """Partitioned batch sink: partition column round-trips; a filter
    on it prunes at planning time (PartitionFilters, not data read)."""
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "part")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    clicks = back.filter(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert clicks.count() == ev.filter(F.col("event_type") == "click").count()


def test_streaming_file_source_twin(spark):
    """stream_table reads the same parquet as a stream; availableNow
    drains it to identical totals as the batch read."""
    batch_count = load_table(spark, SF_SMOKE, "documents").count()
    stream = stream_table(spark, SF_SMOKE, "documents")
    q = (
        stream.writeStream.format("memory")
        .queryName("docs_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT count(*) c FROM docs_stream").collect()[0].c == batch_count


def test_streaming_dropduplicates_with_watermark(spark):
    """T7 scale mode: dropDuplicates over a watermarked stream removes
    re-emissions within the watermark horizon (the reference tolerates
    duplicates; this is the engine's dedup mode)."""
    from pyspark.sql.types import _parse_datatype_string

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.memory import (
        stream_from_rows,
    )

    rows = [
        {"email": "a@test.com", "ts": "2024-01-01T00:00:00.000Z"},
        {"email": "a@test.com", "ts": "2024-01-01T00:00:00.000Z"},  # dup
        {"email": "b@test.com", "ts": "2024-01-01T00:05:00.000Z"},
        {"email": "a@test.com", "ts": "2024-01-01T00:10:00.000Z"},  # new version
    ]
    stream = stream_from_rows(
        spark, rows, _parse_datatype_string("email string, ts timestamp")
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["email", "ts"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.email, str(r.ts)) for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert got == [
        ("a@test.com", "2024-01-01 00:00:00"),
        ("a@test.com", "2024-01-01 00:10:00"),
        ("b@test.com", "2024-01-01 00:05:00"),
    ]


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    """parquet → csv → read back with explicit schema: values identical,
    including timestamp micros (ISO format survives the text hop)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_csv,
        load_table,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "ev_csv")
    ev.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).csv(out)
    back = load_csv(spark, out, schema=ev.schema)
    assert back.schema == ev.schema
    a = {r.event_id: (r.ts, r.user_id, r.event_type, r.value) for r in ev.collect()}
    b = {r.event_id: (r.ts, r.user_id, r.event_type, r.value) for r in back.collect()}
    assert a == b


def test_json_roundtrip_preserves_values(spark, tmp_path):
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_json,
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_json")
    docs.write.json(out)
    back = load_json(spark, out, schema=docs.schema)
    assert back.schema == docs.schema
    a = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in docs.collect())
    b = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect())
    assert a == b


def test_json_stream_replays_batch(spark, tmp_path):
    """NDJSON streaming twin drains to the same rows the batch reader
    sees (file source micro-batching)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
        stream_json,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.streaming.runner import (
        QueryRunner,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.streaming.sinks import (
        to_memory,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "docs_stream_json")
    docs.write.json(out)
    runner = QueryRunner()
    try:
        stream = stream_json(spark, out, docs.schema)
        runner.add("json_stream", to_memory(stream, "json_stream_tbl"))
        runner.drain("json_stream")
        got = spark.sql("SELECT count(*) AS n FROM json_stream_tbl").collect()[0].n
        assert got == docs.count()
    finally:
        runner.stop_all()


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """parquet → ORC → read back: values identical AND filters reach
    the ORC scan (PushedFilters non-empty) — the format is a drop-in
    source for every registry query."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_orc,
        load_table,
        write_orc,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out)
    back = load_orc(spark, out)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    filtered = back.filter(back.o_totalprice > 100000).select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:120]


def test_xml_roundtrip_preserves_values(spark, tmp_path):
    """parquet → XML → read back with explicit schema: values identical
    including markup-hostile text (&, <, > escape correctly through the
    Spark 4 built-in XML source)."""
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
        load_table,
        load_xml,
        write_xml,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    hostile = spark.createDataFrame(
        [(999_999, "a & b < c > d \"quoted\" 'apos'", "en", "srcX", 27)],
        docs.schema,
    )
    both = docs.unionByName(hostile)
    out = str(tmp_path / "docs_xml")
    write_xml(both, out, row_tag="doc")
    back = load_xml(spark, out, row_tag="doc", schema=both.schema)
    a = sorted(map(tuple, both.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
