"""The SQL front door must run ad-hoc statements a reference user
would write, over the registered catalog."""

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.sql_frontend import (
    SqlFrontend,
)

from conftest import SF_SMOKE


def test_adhoc_sql_over_catalog(spark):
    fe = SqlFrontend(spark, SF_SMOKE)
    row = fe.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment LIMIT 1
        """
    ).collect()[0]
    assert row.n > 0 and row.c_mktsegment


def test_decode_idioms_in_sql(spark):
    """The reference's exact SQL idioms work: case-insensitive array
    access, unbase64, from_json, view chaining."""
    fe = SqlFrontend(spark, SF_SMOKE)
    fe.register(
        "RedisSortedSet",
        fe.sql(
            """
            SELECT named_struct(
              'zSetEntries',
              array(named_struct('element', base64(CAST(c_name AS BINARY)), 'Score', '0.0'))
            ).zSetEntries AS zSetEntries
            FROM customer LIMIT 5
            """
        ),
    )
    # lowercase reference against the camelCase column — the reference's
    # own idiom (sparkpykafkajoin.py:79)
    out = fe.sql(
        "SELECT CAST(unbase64(zsetentries[0].element) AS STRING) AS name FROM RedisSortedSet"
    ).collect()
    assert len(out) == 5
    assert all(r.name.startswith("Customer") or r.name for r in out)


def test_cte_and_window_sql(spark):
    fe = SqlFrontend(spark, SF_SMOKE)
    rows = fe.sql(
        """
        WITH ranked AS (
          SELECT user_id, value,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn
          FROM events
        )
        SELECT user_id, value FROM ranked WHERE rn = 1 ORDER BY user_id LIMIT 10
        """
    ).collect()
    assert len(rows) == 10


def test_cli_list_and_json_run():
    """`python -m <pkg>` drives the registry from the shell — list
    shows oracle markers; run --json emits NDJSON rows."""
    import json
    import subprocess
    import sys

    pkg = "data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark"
    out = subprocess.run(
        [sys.executable, "-m", pkg, "list"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert any(l.startswith("* ") for l in lines)
    assert len(lines) >= 150

    run = subprocess.run(
        [sys.executable, "-m", pkg, "run", "doc_length_histogram",
         "--sf-dir", "/root/testdata/sf0.001", "--cpus", "2", "--json"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert run.returncode == 0, run.stderr[-2000:]
    rows = [json.loads(l) for l in run.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and {"log2_bucket", "n_docs"} <= set(rows[0])
