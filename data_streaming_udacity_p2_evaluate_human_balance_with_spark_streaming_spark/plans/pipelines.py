"""The three reference pipelines (SURVEY.md §3.1-3.3) composed from
operators, parameterized by source so the same plan runs over Kafka,
file-replay fixtures, or in-memory batch rows.

Every pipeline is a pure plan builder: pass a batch DataFrame for the
batch twin (oracle-checkable) or a streaming DataFrame for streaming
fidelity (driven with Trigger.AvailableNow in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import decode
from ..operators.joins import equi_join
from ..schemas import STEDI_EVENT


def customer_decode_pipeline(raw_kv: DataFrame) -> DataFrame:
    """`sparkpyrediskafkastreamtoconsole.py` end-to-end (SURVEY.md §3.2):
    Kafka-shaped (key,value) rows → decoded customers → (email, birthYear).
    Stateless narrow pipeline — no shuffle, fuses into one codegen stage."""
    customers = decode.decode_customer(decode.cast_kv_to_string(raw_kv))
    valid = decode.non_null_customers(customers)
    return decode.with_birth_year(valid).select("email", "birthYear")


def risk_event_pipeline(raw_kv: DataFrame) -> DataFrame:
    """`sparkpyeventskafkastreamtoconsole.py` (SURVEY.md §3.3): parse
    stedi-events JSON → (customer, score)."""
    # once=True: the flagship join infers isnotnull(customer) on this
    # leg; without the barrier that filter re-evaluates the JSON parse
    # per row (see decode.evaluated_once)
    parsed = decode.parse_json(
        decode.cast_kv_to_string(raw_kv), "value", STEDI_EVENT, once=True
    )
    return parsed.select("customer", "score")


def flagship_join_pipeline(redis_raw: DataFrame, events_raw: DataFrame) -> DataFrame:
    """`sparkpykafkajoin.py` (SURVEY.md §3.1): decoded customers ⋈ risk
    events on email=customer; output contract
    {customer, score, email, birthYear} (`sparkpykafkajoin.py:144`)."""
    left = customer_decode_pipeline(redis_raw)
    right = risk_event_pipeline(events_raw)
    return equi_join(left, right, "email = customer")


def flagship_join_as_kafka_value(redis_raw: DataFrame, events_raw: DataFrame) -> DataFrame:
    """Flagship join serialized for the Kafka sink
    (`sparkpykafkajoin.py:145`)."""
    return decode.to_json_value(flagship_join_pipeline(redis_raw, events_raw))
