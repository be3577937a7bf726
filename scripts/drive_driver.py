"""Driver simulation: import __spark_entry__ by path, run every query at
sf0.01, compare against the DuckDB oracle (row count, sorted column names,
order-insensitive value multiset, floats rounded to 6, NaN->null)."""
import hashlib
import importlib.util
import math
import sys
import time

import duckdb

import os
SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         # no \r progress frames: they can overwrite an in-flight
         # "ok ..." line and make a green query look unreported
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .appName("drive_driver").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def norm_cell(v):
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # +0.0 canonicalizes -0.0 so a value that rounds to zero with
        # opposite signs on the two engines hashes identically; integral
        # floats then unify with ints (long 5 vs double 5.0)
        v = round(v, 6) + 0.0
        if v.is_integer():
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def multiset_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    e = mod.entry(spark)
    n = e.count()
    assert n >= 0, "entry() produced negative rows?"
    print(f"entry(): {n} rows OK", flush=True)

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    only = sys.argv[1:] or None
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"\nFAIL {name}: spark error: {str(ex)[:200]}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"\nok(rows-only) {name}: {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"\nFAIL {name}: oracle error: {str(ex)[:200]}", flush=True)
            continue
        probs = []
        if len(srows) != len(orows):
            probs.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            probs.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif multiset_hash(srows, scols) != multiset_hash(orows, ocols):
            probs.append("hash mismatch")
        if probs:
            failures.append((name, "; ".join(probs)))
            print(f"\nFAIL {name}: {'; '.join(probs)}", flush=True)
        else:
            print(f"\nok {name}: {len(srows)} rows [{time.time()-t0:.1f}s]",
                  flush=True)

    print(f"\n{len(failures)} failures / {len(qs)} queries")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    sys.exit(1 if failures else 0)


main()
