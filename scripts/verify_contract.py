#!/usr/bin/env python
"""Drive the driver contract exactly like the round driver: entry() smoke
(idempotence + schema) plus the full DuckDB oracle comparison at sf0.01.

Stricter than tuple equality on purpose: values are canonicalized via
``repr`` after 6-dp float rounding, so a DuckDB DECIMAL leaking where Spark
produces a double FAILS here (Python's ``Decimal(x) == float(x)`` would
silently pass — and the driver's value-hash would not).

Usage: ``python scripts/verify_contract.py [sf_dir]`` (default sf0.01).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as m

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = m.entry(spark)
n = df.count()
assert n > 0, "entry returned 0 rows"
df.limit(5).collect()
n2 = m.entry(spark).count()
assert n == n2, f"entry not idempotent: {n} vs {n2}"
print(f"entry OK: {n} rows, schema {df.columns}")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"create view {t} as select * from "
                f"read_parquet('{SF_DIR}/{t}.parquet')")


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


fails = []
for name, sql in m.oracle_sql().items():
    sdf = m.queries()[name](spark, SF_DIR)
    cols = sorted(sdf.columns)
    srows = [row.asDict() for row in sdf.collect()]
    ocur = con.execute(sql)
    ocols = [d[0] for d in ocur.description]
    orows = [dict(zip(ocols, rec)) for rec in ocur.fetchall()]
    if sorted(ocols) != cols:
        fails.append((name, f"cols {cols} vs {sorted(ocols)}"))
        continue
    a, b = canon(srows, cols), canon(orows, cols)
    status = "OK" if a == b else "MISMATCH"
    if a != b:
        diff = [x for x in a[:5] if x not in b[:5]]
        fails.append((name, f"{len(a)} vs {len(b)} rows; sample {diff[:2]}"))
    print(f"{name:28s} {status}  ({len(a)} rows)")

rows_only = [q for q in m.queries() if q not in m.oracle_sql()]
for name in rows_only:
    cnt = m.queries()[name](spark, SF_DIR).count()
    print(f"{name:28s} ROWS-ONLY ({cnt} rows)")

print("FAILURES:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
