import duckdb
import pytest

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark import (
    get_spark,
)
from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.sources.files import (
    TABLES,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="stedi-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def duck_for(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Register the synthetic tables as DuckDB views for `sf_dir`
    (mirrors the driver's pre-registered views)."""
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _norm_cell(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v) if v is not None else "\0NULL"


def assert_matches_oracle(spark_df, duck_con, sql: str, sf_dir: str):
    """Mirror the driver's check: row count + order-insensitive value
    comparison with columns sorted by name."""
    duck_for(duck_con, sf_dir)
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm_cell(r[c]) for c in spark_cols) for r in spark_df.collect()
    ]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    duck_rows = [tuple(_norm_cell(row[i]) for i in order) for row in res.fetchall()]

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={spark_cols} duck={sorted(duck_cols)}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    assert sorted(spark_rows) == sorted(duck_rows), "value mismatch"
