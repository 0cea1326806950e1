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


def test_ndjson_sink_stream_write_exactly_once(spark, tmp_path):
    """Custom Python DataSource STREAM WRITER: rows land exactly once
    across micro-batches under the temp-then-rename two-phase commit —
    no half-visible files (only `part-*.json` names count), temps
    cleaned up, and a checkpoint restart appends the NEW batch without
    duplicating committed ones."""
    import glob
    import json
    import os
    import time

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.ndjson_sink import (
        register_ndjson_sink,
    )
    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.simulator import (
        register_stedi_simulator,
    )

    register_ndjson_sink(spark)
    register_stedi_simulator(spark)
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def run(rows):
        # default trigger + processAllAvailable: availableNow treats
        # one simple-reader read() call as "all available" and stops
        # after a single micro-batch
        q = (
            spark.readStream.format("stedi_sim")
            .option("rows", str(rows))
            .option("rows_per_batch", "20")
            .load()
            .writeStream.format("ndjson_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    run(60)  # 3 micro-batches of 20
    files = sorted(glob.glob(os.path.join(out, "part-*.json")))
    assert files, "no committed output files"
    keys = []
    for fp in files:
        with open(fp) as f:
            keys.extend(json.loads(line)["value"] for line in f)
    assert len(keys) == 60 and len(set(keys)) == 60
    assert not glob.glob(os.path.join(out, ".tmp-*")), "orphaned temp files"

    # restart from the same checkpoint with more input: only the NEW
    # rows append; committed batches are not re-emitted
    run(80)
    keys2 = []
    for fp in sorted(glob.glob(os.path.join(out, "part-*.json"))):
        with open(fp) as f:
            keys2.extend(json.loads(line)["value"] for line in f)
    assert len(keys2) == 80 and len(set(keys2)) == 80
    time.sleep(0)  # keep imports referenced on early asserts


def test_ndjson_sink_batch_write(spark, tmp_path):
    """Batch writer leg of the custom sink: same two-phase protocol."""
    import glob
    import json
    import os

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.ndjson_sink import (
        register_ndjson_sink,
    )

    register_ndjson_sink(spark)
    out = str(tmp_path / "batch_out")
    df = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(25)], "key string, value string"
    )
    df.write.format("ndjson_sink").option("path", out).mode("append").save()

    def read_keys():
        rows = []
        for fp in sorted(glob.glob(os.path.join(out, "part-*.json"))):
            with open(fp) as f:
                rows.extend(json.loads(line)["key"] for line in f)
        return sorted(rows)

    assert read_keys() == sorted(f"k{i}" for i in range(25))
    assert not glob.glob(os.path.join(out, ".tmp-*"))

    # a second append must COEXIST with the first (unique commit ids,
    # not fixed batch 0 — the r5 data-loss advice)
    df2 = spark.createDataFrame(
        [(f"x{i}", f"v{i}") for i in range(5)], "key string, value string"
    )
    df2.write.format("ndjson_sink").option("path", out).mode("append").save()
    assert read_keys() == sorted(
        [f"k{i}" for i in range(25)] + [f"x{i}" for i in range(5)]
    )

    # overwrite clears all previously committed parts
    df2.write.format("ndjson_sink").option("path", out).mode("overwrite").save()
    assert read_keys() == sorted(f"x{i}" for i in range(5))
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_ndjson_sink_failed_batch_invisible_then_replayed(spark, tmp_path):
    """Crash-recovery leg of the 2PC sink: a micro-batch that fails
    mid-write must leave NO committed file (temps are either aborted
    or invisible to the part-*.json glob), and restarting from the
    checkpoint replays that batch into its deterministic name —
    exactly-once output across the failure."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.ndjson_sink import (
        register_ndjson_sink,
    )

    register_ndjson_sink(spark)
    src = str(tmp_path / "poison_src")
    out = str(tmp_path / "poison_out")
    ckpt = str(tmp_path / "poison_ckpt")
    os.makedirs(src)
    # batch 0: clean; batch 1: contains the poison key
    for i, rows in enumerate([[f"k{j}" for j in range(10)],
                              [f"k{j}" for j in range(10, 19)] + ["POISON"]]):
        with open(f"{src}/f{i}.json", "w") as f:
            for k in rows:
                f.write(json.dumps({"key": k, "value": "v"}) + "\n")
        os.utime(f"{src}/f{i}.json", (1700000000 + i, 1700000000 + i))

    def start(guard: bool):
        stream = (
            spark.readStream.format("json")
            .schema("key string, value string")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        if guard:
            stream = stream.filter(F.col("key") != "POISON")
        else:
            # poison: force a task failure inside batch 1
            stream = stream.withColumn(
                "value",
                F.when(
                    F.col("key") == "POISON",
                    F.assert_true(F.lit(False), F.lit("poisoned row")).cast(
                        "string"
                    ),
                ).otherwise(F.col("value")),
            )
        return (
            stream.writeStream.format("ndjson_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start(guard=False)
    try:
        q.processAllAvailable()
        raised = False
    except Exception:
        raised = True
    finally:
        try:
            q.stop()
        except Exception:
            pass
    assert raised or q.exception() is not None, "poison batch should fail"
    committed = sorted(glob.glob(os.path.join(out, "part-*.json")))
    keys = []
    for fp in committed:
        with open(fp) as f:
            keys.extend(json.loads(line)["key"] for line in f)
    # only batch 0 committed; the failed batch is invisible
    assert sorted(keys) == [f"k{j}" for j in range(10)], keys

    # restart from the same checkpoint with the poison filtered out:
    # batch 1 replays into its deterministic name, once
    q2 = start(guard=True)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination()
    keys2 = []
    for fp in sorted(glob.glob(os.path.join(out, "part-*.json"))):
        with open(fp) as f:
            keys2.extend(json.loads(line)["key"] for line in f)
    assert sorted(keys2) == sorted(f"k{j}" for j in range(19)), keys2
