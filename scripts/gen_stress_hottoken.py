"""Generate the HOT-TOKEN skew adversary for the prefix join (r13,
VERDICT item 6): the midvocab corpus (same construction and seed as
gen_stress_midvocab.py) plus N_BOILER appended "boilerplate" docs,
each 30 UNIFORM draws from the top-62 Zipf head ranks plus one planted
token shared by ALL boilerplate docs.

Why this exact shape (the df arithmetic matters — a naive plant never
reaches the prefix): the tau = 0.6 prefix keeps a doc's ~40% rarest
tokens, so a token lands in many PREFIXES only if those docs' other
tokens are even more common.  Planting into existing midvocab docs
fails: their cluster rares (df ~ 4) and tail heads (df < 10k for
ranks > ~20) out-rare any token frequent enough to be "hot".  The
boilerplate construction works by inversion: df(hot) = N_BOILER =
3,000 while every other boiler token is a top-62 head with df >=
~4,400 (250k x 62^-1.07 base draws + ~1,450 boiler draws), so hot is
PROVABLY each boiler doc's rarest token — prefix position 1 in all
3,000.  The prefix equi-join then meets 3000^2/2 = 4.5M pairs on that
single key: the skew cell.  Uniform (not Zipf) draws keep
boiler-boiler Jaccard concentrated near 30.30/62 / union ~ 0.33 << 0.6
(hypergeometric, sd ~ 2), so the cell is ~pure false candidates and
the leg times skew handling + candidate pruning, not output volume.

What the engine must do with it (measured, SCALE.md r13): kill the
cell's meetings in-join (positional passes at (1,1); the r13
suffix-histogram bound is the one that discriminates), and keep the
single hot key from serializing the join (broadcast at this SF; AQE
skew-split at shuffle scale).

Usage: python scripts/gen_stress_hottoken.py [out_dir] [n_docs] [n_boiler]
Defaults: /tmp/stress_hottoken  50000  3000
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_hottoken"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
N_BOILER = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000
HOT_TOKEN = "hotboiler"
BOILER_POOL = 62       # top head ranks the boiler docs draw from
BOILER_TOKENS = 30     # distinct draws per boiler doc
V_HEAD = 5000
V_RARE = 45_000
CLUSTER = 4
HEAD_TOKENS = 32
RARE_TOKENS = 8
PERTURB = 0.08
MIN_ARRAY_PATH_VOCAB = 504


def main() -> None:
    rng = np.random.default_rng(7)  # = gen_stress_midvocab's corpus
    ranks = np.arange(1, V_HEAD + 1, dtype=np.float64)
    p = 1.0 / ranks ** 1.07
    p /= p.sum()

    n_clusters = N_DOCS // CLUSTER
    head = rng.choice(V_HEAD, size=(n_clusters, HEAD_TOKENS), p=p)
    rare = V_HEAD + rng.integers(0, V_RARE,
                                 size=(n_clusters, RARE_TOKENS))
    bases = np.concatenate([head, rare], axis=1)
    n_base = HEAD_TOKENS + RARE_TOKENS
    repl = rng.choice(V_HEAD, size=(n_clusters, CLUSTER, n_base), p=p)
    flip = rng.random((n_clusters, CLUSTER, n_base)) < PERTURB

    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for c in range(n_clusters):
        for j in range(CLUSTER):
            toks = np.where(flip[c, j], repl[c, j], bases[c])
            toks = np.unique(toks)
            text = " ".join(f"t{t}" for t in toks)
            i = c * CLUSTER + j
            doc_ids.append(i)
            texts.append(text)
            langs.append("en" if i % 5 else "de")
            sources.append(f"src{i % 7}")
            n_chars.append(len(text))

    boiler_rng = np.random.default_rng(99)
    for k in range(N_BOILER):
        toks = boiler_rng.choice(BOILER_POOL, size=BOILER_TOKENS,
                                 replace=False)
        text = " ".join([HOT_TOKEN] + [f"t{t}" for t in sorted(toks)])
        i = N_DOCS + k
        doc_ids.append(i)
        texts.append(text)
        langs.append("en")
        sources.append("boiler")
        n_chars.append(len(text))

    vocab = len({t for txt in texts for t in txt.split()})
    assert vocab > MIN_ARRAY_PATH_VOCAB
    # the construction's load-bearing claim: hot is each boiler doc's
    # RAREST token, so it heads all N_BOILER prefixes
    df = {}
    for txt in texts:
        for t in set(txt.split()):
            df[t] = df.get(t, 0) + 1
    assert df[HOT_TOKEN] == N_BOILER
    pool_min = min(df[f"t{t}"] for t in range(BOILER_POOL))
    assert pool_min > N_BOILER, (
        f"hot token must out-rare the boiler pool: min pool df "
        f"{pool_min} <= {N_BOILER}")

    os.makedirs(OUT, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(table, os.path.join(OUT, "documents.parquet"))
    print(f"documents: {len(doc_ids)} rows, vocab V={vocab}, "
          f"df({HOT_TOKEN})={df[HOT_TOKEN]}, min boiler-pool df="
          f"{pool_min} -> {OUT}")


if __name__ == "__main__":
    main()
