"""Emulate the spark-graft driver: plain SparkSession (driver's own
config, NOT the engine's get_spark), import __spark_entry__, run
entry() + queries()/oracle_sql() cross-check at sf0.01 via DuckDB."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("driver-emulation")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# 1. smoke: entry()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[(f.name, f.dataType.simpleString()) for f in df.schema.fields]}")
print("entry() sample:", rows[0].asDict() if rows else None)

# 2. correctness: every queries() key vs oracle_sql() at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import datetime, decimal, math

def norm(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v) if v is not None else "\0NULL"

qs, os_ = e.queries(), e.oracle_sql()
# optional argv filter: `python scripts/driver_check.py q1 q2` checks only those
if len(sys.argv) > 1:
    wanted = set(sys.argv[1:])
    qs = {n: f for n, f in qs.items() if n in wanted}
print(f"{len(qs)} queries, {len(os_)} oracles")
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    if name not in os_:
        print(f"  {name}: rows-only, {len(srows)} rows")
        continue
    res = con.execute(os_[name])
    dcols = [d[0] for d in res.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(tuple(norm(row[i]) for i in order) for row in res.fetchall())
    ok = srows == drows and [c.lower() for c in cols] == sorted(c.lower() for c in dcols)
    fails += 0 if ok else 1
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} spark={len(srows)} duck={len(drows)}")
    if not ok and srows and drows:
        print("    spark[0]:", srows[0]); print("    duck[0] :", drows[0])
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} MISMATCHES")
sys.exit(1 if fails else 0)
