"""Debug q_submission_pipeline vs its DuckDB oracle: print both sorted."""
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8")
         .appName("dbg").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from big_data_bowl_spark.queries import q_submission_pipeline  # noqa: E402
from big_data_bowl_spark.oracles import ORACLES  # noqa: E402

sdf = q_submission_pipeline(spark, SF_DIR)
srows = sorted(tuple(r) for r in sdf.collect())

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/{t}.parquet')")
res = con.execute(ORACLES["q_submission_pipeline"])
ocols = [d[0] for d in res.description]
orows = sorted(tuple(r) for r in res.fetchall())

print("spark cols:", sdf.columns)
print("oracle cols:", ocols)
print(f"spark rows: {len(srows)}  oracle rows: {len(orows)}")
n_bad = 0
for i, (s, o) in enumerate(zip(srows, orows)):
    if s != o:
        n_bad += 1
        if n_bad <= 8:
            print(f"DIFF row {i}:\n  spark : {s}\n  oracle: {o}")
print(f"{n_bad} differing rows")
