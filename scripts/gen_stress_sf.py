"""Generate a replica-shifted stress-scale copy of an existing testdata SF
(default: sf0.1 x 10 = "sf1.0") for the SCALE.md stress sweep.

NOT a correctness input — correctness always runs against the driver's
read-only /root/testdata parquet.  This exists solely to empirically
check scaling LINEARITY of the headline plans one decade past the bench
SF (candidate-generation fan-out, shuffle growth, skew) without touching
the read-only tree.

Construction: R replicas of every table, replica i shifting every
key/id column by i*STRIDE so referential integrity holds WITHIN each
replica (joins neither break nor cross replicas — fan-out per key is
preserved, total volume scales by R).  Dimension tables (region, nation)
and timestamps are left as-is: same calendar span with R x rows per day
is exactly what a bigger SF looks like.

Similarity payloads must scale LINEARLY too, or the sweep measures
result-set blowup instead of plan scaling:
- documents: every TOKEN gets a per-replica suffix (~r3), so shingle /
  gram sets are DISJOINT across replicas — near-dup clusters keep their
  sf0.1 sizes, there are just R x as many of them.  (A doc-level suffix
  is not enough: two long texts differing in one token are still ~95%
  Jaccard-similar and every minhash/simhash/span query would emit
  R^2-growing cross-replica pairs.)
- embeddings: a per-(replica, dim) pseudo-random SIGN FLIP — an
  orthogonal transform, so within-replica geometry (norms, distances,
  cosines) is preserved EXACTLY while cross-replica cosines scramble to
  ~N(0, 1/d) noise, far below any near-dup threshold.

Usage: python scripts/gen_stress_sf.py [out_dir] [replicas] [src_dir]
Defaults: /tmp/stress_sf1.0  10  /root/testdata/sf0.1
"""
import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1.0"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
STRIDE = 100_000_000  # far above any real key at any driver SF

# table -> columns to shift by replica*STRIDE
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
for t, keys in SHIFT.items():
    src = f"read_parquet('{SRC}/{t}.parquet')"
    if not keys:  # dimensions: single copy
        con.execute(f"COPY (SELECT * FROM {src}) TO '{OUT}/{t}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        print(f"{t}: {n} rows (unreplicated dim)")
        continue
    cols = [c[0] for c in
            con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
    sel = []
    for c in cols:
        if c in keys:
            sel.append(f"{c} + r.i * {STRIDE} AS {c}")
        elif t == "documents" and c == "text":
            sel.append("CASE WHEN r.i = 0 THEN text ELSE "
                       "regexp_replace(text, '(\\S+)', "
                       "'\\1~r' || r.i, 'g') END AS text")
        elif t == "documents" and c == "n_chars":
            sel.append("CAST(length(CASE WHEN r.i = 0 THEN text ELSE "
                       "regexp_replace(text, '(\\S+)', '\\1~r' || r.i, "
                       "'g') END) AS BIGINT) AS n_chars")
        elif t == "embeddings" and c == "embedding":
            sel.append(
                "CAST(list_transform(embedding, (x, d) -> "
                "CASE WHEN r.i = 0 THEN x ELSE "
                "x * CAST(1 - 2 * CAST(hash(r.i * 4096 + d) % 2 AS INT) "
                "AS FLOAT) END) AS FLOAT[]) AS embedding")
        else:
            sel.append(c)
    q = (f"COPY (SELECT {', '.join(sel)} FROM {src}, "
         f"(SELECT unnest(range({R})) AS i) r) "
         f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(q)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({R} replicas)")
print(f"done -> {OUT}")
