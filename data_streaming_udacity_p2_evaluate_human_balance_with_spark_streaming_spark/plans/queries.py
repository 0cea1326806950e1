"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, paired with an equivalent DuckDB
oracle SQL string (None for non-SQL-expressible ops → driver runs a
rows-only check).

Conventions (driver contract, /root/repo/__spark_entry__.py):
- every computed column is aliased identically in Spark and SQL;
- float-typed outputs are either exact (count/min/max) or rounded after
  DECIMAL-exact arithmetic so cross-engine hashes match;
- string-typed numerics go through DECIMAL(10,2) → string on both sides
  (the reference's numerics-as-strings fidelity, SURVEY.md §1.2).

The synthetic tables (TESTDATA.md) stand in for the reference's streams
per the mapping in /root/repo/FIXTURES.md: `customer` = decoded Customer
records, `events` = stedi risk events, `documents`/`embeddings` = the
LLM-pipeline extension tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import decode
from ..sources.files import load_table
from . import pipelines

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query_fn, oracle_sql | None). Populated by @register below.
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# --------------------------------------------------------------------------
# Fixture synthesis: the driver's TPC-H-ish tables stand in for the
# reference's Kafka streams (FIXTURES.md). These helpers build the exact
# raw payloads the reference consumes — a Redis-changefeed envelope with a
# base64 Customer element, and a stedi-events JSON record — deterministically
# from `customer` / `events`, so the decode operators are exercised
# end-to-end and the oracle can compute the same values directly.
# --------------------------------------------------------------------------


def _customer_json(cust: DataFrame):
    """Customer JSON payload (project/starter/README.md:84 contract)."""
    return F.to_json(
        F.struct(
            F.col("c_name").alias("customerName"),
            F.format_string("c%d@test.com", "c_custkey").alias("email"),
            F.format_string("555-%04d", F.col("c_custkey") % 10000).alias("phone"),
            F.format_string(
                "%04d-%02d-%02d",
                (F.lit(1950) + F.col("c_custkey") % 50),
                (F.lit(1) + F.col("c_custkey") % 12),
                (F.lit(1) + F.col("c_custkey") % 28),
            ).alias("birthDay"),
        )
    )


def synth_redis_envelope_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped (key,value binary) rows carrying the redis-server
    envelope (project/starter/README.md:56-73): zSetEntries[0].element =
    base64(customer JSON)."""
    cust = load_table(spark, sf_dir, "customer")
    envelope = F.to_json(
        F.struct(
            F.lit("Q3VzdG9tZXI=").alias("key"),  # base64("Customer")
            F.lit("NONE").alias("existType"),
            F.lit(False).alias("Ch"),
            F.lit(False).alias("Incr"),
            F.array(
                F.struct(
                    F.base64(_customer_json(cust).cast("binary")).alias("element"),
                    F.lit("0.0").alias("Score"),
                )
            ).alias("zSetEntries"),
        )
    )
    return cust.select(
        F.lit("Q3VzdG9tZXI=").cast("binary").alias("key"),
        envelope.cast("binary").alias("value"),
    )


def synth_stedi_events_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped rows carrying stedi-events JSON
    (project/starter/README.md:98-103): {customer, score, riskDate},
    score as string (reference fidelity, sparkpykafkajoin.py:26)."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.format_string("c%d@test.com", "user_id").alias("customer"),
            F.col("value").cast("decimal(10,2)").cast("string").alias("score"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("riskDate"),
        )
    )
    return ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
    )


# Oracle-side CTEs computing the same synthesized values directly (the
# base64 round-trip is the identity, so the oracle skips it — what's
# checked is that Spark's decode path reproduces these exact values).
_CUST_CTE = """
cust AS (
    SELECT 'c' || CAST(c_custkey AS VARCHAR) || '@test.com' AS email,
           CAST(1950 + c_custkey % 50 AS VARCHAR) AS birthYear
    FROM customer
)
"""

_EV_CTE = """
ev AS (
    SELECT 'c' || CAST(user_id AS VARCHAR) || '@test.com' AS customer,
           CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS score
    FROM events
)
"""


# --------------------------------------------------------------------------
# Reference-parity queries (SURVEY.md §2.3/§2.4/§2.6/§2.7)
# --------------------------------------------------------------------------


@register(
    "flagship_stedi_join",
    f"WITH {_CUST_CTE}, {_EV_CTE} "
    "SELECT email, birthYear, customer, score FROM cust JOIN ev ON email = customer",
)
def q_flagship_stedi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §3.1 end-to-end: envelope decode → null-filter →
    birthYear → inner equi-join with risk events (sparkpykafkajoin.py
    whole-file lineage; output contract at :144)."""
    redis_raw = synth_redis_envelope_kv(spark, sf_dir)
    events_raw = synth_stedi_events_kv(spark, sf_dir)
    return pipelines.flagship_join_pipeline(redis_raw, events_raw)


@register(
    "customer_decode",
    f"WITH {_CUST_CTE} SELECT email, birthYear FROM cust",
)
def q_customer_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §3.2 (sparkpyrediskafkastreamtoconsole.py): envelope →
    base64 decode → JSON parse → null filter → (email, birthYear)."""
    return pipelines.customer_decode_pipeline(synth_redis_envelope_kv(spark, sf_dir))


@register(
    "risk_events_project",
    f"WITH {_EV_CTE} SELECT customer, score FROM ev",
)
def q_risk_events_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §3.3 (sparkpyeventskafkastreamtoconsole.py): JSON parse →
    temp view → SQL projection (V3/V4/P6, sparkpyeventskafkastreamtoconsole.py:24-35)."""
    parsed = pipelines.risk_event_pipeline(synth_stedi_events_kv(spark, sf_dir))
    parsed.createOrReplaceTempView("CustomerRisk")
    return spark.sql("SELECT customer, score FROM CustomerRisk")


@register(
    "kafka_cast_project",
    "SELECT CAST(event_id AS VARCHAR) AS key, props AS value FROM events",
)
def q_kafka_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (sparkpykafkajoin.py:42): binary key/value → string via
    selectExpr CAST."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
    )
    return decode.cast_kv_to_string(raw)


@register(
    "json_parse_flatten",
    "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events",
)
def q_json_parse_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+P2 (sparkpykafkajoin.py:75-76): from_json + struct-star flatten,
    with lenient numeric→string coercion (SURVEY.md §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "parsed", F.from_json("props", "k string")
    ).select("event_id", F.col("parsed.*"))


@register(
    "base64_roundtrip",
    "SELECT c_custkey, to_base64(encode(c_name)) AS encoded, "
    "decode(from_base64(to_base64(encode(c_name)))) AS decoded FROM customer",
)
def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4 (sparkpykafkajoin.py:86): base64 ⟲ unbase64 round-trip."""
    cust = load_table(spark, sf_dir, "customer")
    encoded = F.base64(F.col("c_name").cast("binary"))
    return cust.select(
        "c_custkey",
        encoded.alias("encoded"),
        decode.decode_base64_str(encoded).alias("decoded"),
    )


@register(
    "null_filter",
    "SELECT event_id, event_type FROM events "
    "WHERE nullif(event_type, 'error') IS NOT NULL",
)
def q_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (sparkpykafkajoin.py:99-100): null-rejection filter over a
    column that parses to null for 'foreign' rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.expr("nullif(event_type, 'error')").alias("event_type")
    ).filter(F.col("event_type").isNotNull())


@register(
    "split_year",
    "SELECT l_orderkey, l_linenumber, "
    "split_part(strftime(l_shipdate, '%Y-%m-%d'), '-', 1) AS ship_year FROM lineitem",
)
def q_split_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (sparkpykafkajoin.py:102): split(date_string,'-')[0] year
    extraction, kept as split for reference fidelity."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.split(F.date_format("l_shipdate", "yyyy-MM-dd"), "-").getItem(0).alias(
            "ship_year"
        ),
    )


@register(
    "zset_explode",
    f"WITH {_CUST_CTE} SELECT email, birthYear FROM cust "
    "UNION ALL SELECT email, birthYear FROM cust",
)
def q_zset_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of F7 (SURVEY.md §2.6-F7 warning): explode ALL
    zSetEntries instead of [0] — lossless on multi-entry zadds. The
    fixture packs the same customer twice, so the oracle is a self-union."""
    cust = load_table(spark, sf_dir, "customer")
    entry = F.struct(
        F.base64(_customer_json(cust).cast("binary")).alias("element"),
        F.lit("0.0").alias("Score"),
    )
    env = cust.select(F.array(entry, entry).alias("zSetEntries"))
    exploded = env.select(F.explode("zSetEntries").alias("e"))
    customers = exploded.withColumn(
        "c", F.from_json(decode.decode_base64_str(F.col("e.element")), "customerName string, email string, phone string, birthDay string")
    ).select("c.*")
    valid = decode.non_null_customers(customers)
    return decode.with_birth_year(valid).select("email", "birthYear")


def all_queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
