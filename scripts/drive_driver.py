"""Simulate the external driver: import __spark_entry__ by path, run
entry(), then run every queries() entry at sf0.01 and compare against
oracle_sql() via DuckDB — row count, sorted columns, order-insensitive
value multiset."""
import importlib.util
import os
import math
import sys
import time

spec = importlib.util.spec_from_file_location("__spark_entry__",
                                              "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, "
      f"{time.time()-t0:.1f}s")
print("ENTRY sample:", rows[:2])
assert len(rows) > 0

import duckdb
con = duckdb.connect()
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
for name in ("region nation customer supplier part orders lineitem events "
             "documents embeddings").split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6) + 0.0
            if v is not None and not isinstance(v, (str, bool)):
                try:
                    iv = int(v)
                    v = iv if iv == v else float(v)
                except (TypeError, ValueError):
                    v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


qs = mod.queries()
oracles = mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    except Exception as e:
        fails.append((name, f"SPARK ERROR {e}"))
        print(f"  {name}: SPARK ERROR {str(e)[:200]}")
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"  {name}: rows-only {len(srows)} rows {dt:.1f}s")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok_cols = sorted(scols) == sorted(dcols)
    ok_n = len(srows) == len(drows)
    ok_vals = ok_cols and ok_n and norm(srows, scols) == norm(drows, dcols)
    status = "OK" if (ok_cols and ok_n and ok_vals) else \
        f"MISMATCH cols={ok_cols} n={ok_n}({len(srows)}/{len(drows)}) vals={ok_vals}"
    if not (ok_cols and ok_n and ok_vals):
        fails.append((name, status))
        sn, dn = norm(srows, scols), norm(drows, dcols)
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        print(f"  {name}: {status} {dt:.1f}s first-diffs={diff}")
    else:
        print(f"  {name}: OK {len(srows)} rows {dt:.1f}s")

print(f"\nRESULT: {len(qs) - len(fails)}/{len(qs)} ok; fails={fails}")
sys.exit(1 if fails else 0)
