"""Custom Python Data Source (Spark 4 API): partitioned, deterministic,
feeds the decode pipeline unchanged."""

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans import (
    pipelines,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.simulator import (
    register_stedi_simulator,
)


def test_simulator_source_partitioned_and_deterministic(spark):
    register_stedi_simulator(spark)
    raw = (
        spark.read.format("stedi_sim")
        .option("rows", 60)
        .option("partitions", 5)
        .load()
    )
    assert raw.rdd.getNumPartitions() == 5
    a = sorted(r.value for r in raw.collect())
    b = sorted(r.value for r in raw.collect())
    assert a == b  # deterministic re-read
    assert len(a) == 60


def test_simulator_stream_reader(spark):
    """Streaming twin: micro-batched emission through the decode
    pipeline; availableNow drains all configured rows."""
    register_stedi_simulator(spark)
    raw = (
        spark.readStream.format("stedi_sim")
        .option("rows", 45)
        .option("rows_per_batch", 10)
        .load()
    )
    decoded = pipelines.customer_decode_pipeline(raw)
    q = decoded.writeStream.format("memory").queryName("sim_stream").start()
    try:
        q.processAllAvailable()  # source idles once all 45 rows emitted
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sim_stream").collect()
    assert len(rows) == 45
    assert {r.email for r in rows} == {f"c{i}@test.com" for i in range(45)}


def test_simulator_feeds_decode_pipeline(spark):
    register_stedi_simulator(spark)
    raw = spark.read.format("stedi_sim").option("rows", 30).load()
    decoded = pipelines.customer_decode_pipeline(raw)
    got = {(r.email, r.birthYear) for r in decoded.collect()}
    assert ("c0@test.com", "1950") in got
    assert ("c29@test.com", "1979") in got
    assert len(got) == 30


def test_simulator_stream_resumes_from_checkpoint(spark, tmp_path):
    """Offset-based exactly-once resume: a first run drains rows
    0..19 and commits its offset; a second run against the SAME
    checkpoint with a larger `rows` bound must emit ONLY 20..39 —
    nothing replayed, nothing skipped."""
    from pyspark.sql import functions as F

    register_stedi_simulator(spark)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(total_rows):
        q = (
            spark.readStream.format("stedi_sim")
            .option("rows", total_rows)
            .option("rows_per_batch", 7)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(20)
    run(40)
    got = spark.read.parquet(sink).select("key", "value").collect()
    assert len(got) == 40  # exactly once: 20 + 20, no replays
    # every simulated customer appears exactly once
    emails = [r.value for r in got]
    assert len(set(emails)) == 40
