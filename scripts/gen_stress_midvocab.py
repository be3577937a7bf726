"""Generate the LARGE-VOCABULARY Jaccard stress corpus (r12, VERDICT
item 3): a documents table whose distinct-token count V >> 504, so
``jaccard_prefix_pairs`` takes its classic ARRAY path (the bitmask
fast path caps at 504 = 8 int64 words) and the rarest-first prefix
filter actually has leverage.

Why this exists: the sf1.0 replica stress data (gen_stress_sf.py) has
V = 31 x 10 replicas = 310 <= 504, so it stays on the r11 bitmask
path — after r11 the array path (the one REAL corpora take) had NO
recorded stress time, and a regression in its prefix-join plan would
pass every committed gate.  This corpus gives ``q_jaccard_prefix`` a
second stress leg pinned to that path (stress_check.py VARIANTS; the
path selector itself is asserted in tests/test_plans.py).

Vocabulary shape matters (measured): a pure Zipf(5000) draw over 50k
docs leaves even the rarest token in ~30 docs' PREFIXES — 93M
candidates for 73k true pairs, i.e. the prefix filter prunes nothing
and the leg times candidate-set blowup, not the plan.  Real corpora
obey Heaps' law: the tail is document-specific (entity names, ids).
So each 4-doc cluster draws 32 tokens from a Zipf(s=1.07) HEAD of
5,000 ranks (shared stop-word pressure — the thing the filter must
dissolve) plus 8 tokens from a 45,000-rank RARE pool keyed to the
cluster (the thing the filter prunes WITH: rarest-first prefixes are
dominated by cluster-local tokens).  Docs perturb ~8% of base tokens
with fresh head draws, so within-cluster Jaccard lands ~0.7-0.85
(true pairs at tau = 0.6 ~ 6 per cluster — output LINEAR in N).
All five documents columns are emitted so sources.io's declared
schema reads it unchanged.

Usage: python scripts/gen_stress_midvocab.py [out_dir] [n_docs]
Defaults: /tmp/stress_midvocab  50000   (= 10x the sf0.1 doc count,
the same decade-up the sf1.0 replica leg uses)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_midvocab"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
V_HEAD = 5000
V_RARE = 45_000  # rare pool ids V_HEAD .. V_HEAD+V_RARE-1
CLUSTER = 4
HEAD_TOKENS = 32
RARE_TOKENS = 8
PERTURB = 0.08
MIN_ARRAY_PATH_VOCAB = 504  # jaccard_prefix_pairs' small_vocab_bits


def main() -> None:
    rng = np.random.default_rng(7)
    ranks = np.arange(1, V_HEAD + 1, dtype=np.float64)
    p = 1.0 / ranks ** 1.07
    p /= p.sum()

    n_clusters = N_DOCS // CLUSTER
    # one vectorized draw per role: shared Zipf head, cluster-local
    # rare tail, per-doc head perturbations
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
            toks = np.unique(toks)  # token SETS — the op's grain anyway
            text = " ".join(f"t{t}" for t in toks)
            i = c * CLUSTER + j
            doc_ids.append(i)
            texts.append(text)
            langs.append("en" if i % 5 else "de")
            sources.append(f"src{i % 7}")
            n_chars.append(len(text))

    vocab = len({t for txt in texts for t in txt.split()})
    assert vocab > MIN_ARRAY_PATH_VOCAB, (
        f"midvocab corpus must force the array path: V={vocab} <= "
        f"{MIN_ARRAY_PATH_VOCAB}")

    os.makedirs(OUT, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(table, os.path.join(OUT, "documents.parquet"))
    print(f"documents: {len(doc_ids)} rows, vocab V={vocab} "
          f"(> {MIN_ARRAY_PATH_VOCAB} => array path) -> {OUT}")


if __name__ == "__main__":
    main()
