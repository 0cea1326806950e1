"""Physical-plan introspection: the properties that decide whether a
plan survives 100 TB, extracted as data instead of eyeballed from
`.explain()` output.

Users (and this repo's plan-shape tests) ask the same questions of
every query: did the filters reach the scan? how many columns does the
scan actually read? how many shuffles? is there a single-partition
window funneling the whole dataset through one task? These helpers
answer them from the executed-plan text, so CI can assert on plan
shape the same way it asserts on results — plan regressions (a lost
pushdown, a new exchange, a global window) fail a test instead of
shipping a 100× slowdown.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (pre-execution; AQE may still refine
    it at runtime — for final-plan assertions execute first and read
    the part before 'Initial Plan')."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_report(df: DataFrame) -> list[dict]:
    """One dict per file scan: data format, pushed-down filters, and
    the columns actually read. An empty pushed-filter list under a
    selective query, or a read schema wider than the projection, is a
    scan that does 100× the necessary I/O at scale."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan (\w+) [^\n]*", plan):
        line = m.group(0)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", line)
        out.append(
            {
                "format": m.group(1),
                "pushed_filters": [
                    f.strip() for f in (pushed.group(1) if pushed else "").split(",") if f.strip()
                ],
                "read_columns": [
                    c.split(":")[0] for c in (schema.group(1) if schema else "").split(",") if c
                ],
            }
        )
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcasts and reused
    exchanges) — each one is a full materialize-and-redistribute of its
    input; the first number to minimize in any scale review."""
    plan = executed_plan(df)
    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (?:hash|range|Single)", plan))


def single_partition_windows(df: DataFrame) -> list[str]:
    """Window operators with NO partition spec — the whole dataset
    sorted on one task. Empty list = scale-safe; any entry is a 100 TB
    failure waiting (see operators/ranking.py for the two-pass fix)."""
    plan = executed_plan(df)
    hits = []
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            spec = re.search(r"windowspecdefinition\(([^)]*)\)", line)
            args = spec.group(1) if spec else ""
            # partition columns precede the ORDER BY ... ASC/DESC args;
            # a spec that starts with an ordered column has no partition
            first = args.split(",")[0].strip()
            if not first or "ASC" in first or "DESC" in first:
                hits.append(line.strip())
    return hits


def observe_quality(df: DataFrame, *, numeric_col: str | None = None):
    """Attach single-pass data-quality counters to a DataFrame via
    Spark's Observation API: row count, per-row null-any count, and
    (optionally) min/max of a numeric column. The metrics ride the
    SAME job that materializes `df` — at 100 TB this is the difference
    between free pipeline telemetry and a second full scan to compute
    `df.count()` / `df.filter(isnull).count()`.

    Returns (observed_df, observation). Read `observation.get` AFTER an
    action on observed_df; the dict carries n_rows / n_any_null and
    min/max when requested."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    any_null = None
    for c in df.columns:
        isn = F.isnull(F.col(c))
        any_null = isn if any_null is None else (any_null | isn)
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(any_null, 1).otherwise(0)).alias("n_any_null"),
    ]
    if numeric_col is not None:
        metrics.append(F.min(numeric_col).alias(f"min_{numeric_col}"))
        metrics.append(F.max(numeric_col).alias(f"max_{numeric_col}"))
    obs = Observation()
    return df.observe(obs, *metrics), obs
