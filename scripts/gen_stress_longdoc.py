"""Generate the LONG-DOCUMENT Jaccard stress corpus (r13, VERDICT
item 3): same cluster construction as gen_stress_midvocab.py but with
~290 distinct tokens per doc — the web-page shape — so the exact
set-similarity join's VERIFICATION cost (array-fetch joins +
array_intersect, both O(doc length) per candidate) dominates the way
it does on real crawl corpora.

Why this exists: the midvocab corpus (40 tokens/doc) is the
SHORT-record regime, where Mann et al. (VLDB'16) measure suffix-type
filters near break-even — and indeed the r13 suffix-histogram filter
wins only ~1.3x there.  On long records the same filter is worth 2-5x
(measured r13: 76s -> 33s on this corpus, candidates 7.98M -> 1.6M,
output bit-identical), because every pruned candidate saves an
O(length) verification.  Without this leg, a regression that silently
disabled the suffix filter would cost little at midvocab and pass
every committed gate while quintupling the cost on the corpus shape
actual users have.

Vocabulary shape: 4-doc clusters draw 240 tokens from a Zipf(s=1.07)
head of 20,000 ranks plus 60 tokens from a 200,000-rank cluster-keyed
rare pool; docs perturb ~8% of base tokens with fresh head draws, so
within-cluster Jaccard lands ~0.7-0.85 (true pairs at tau = 0.6
LINEAR in N).  20k docs keep the leg's wall-time near the midvocab
leg's despite 7x the tokens per doc.

Usage: python scripts/gen_stress_longdoc.py [out_dir] [n_docs]
Defaults: /tmp/stress_longdoc  20000
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_longdoc"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
V_HEAD = 20_000
V_RARE = 200_000  # rare pool ids V_HEAD .. V_HEAD+V_RARE-1
CLUSTER = 4
HEAD_TOKENS = 240
RARE_TOKENS = 60
PERTURB = 0.08
MIN_ARRAY_PATH_VOCAB = 504  # jaccard_prefix_pairs' small_vocab_bits


def main() -> None:
    rng = np.random.default_rng(11)
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
        f"longdoc corpus must force the array path: V={vocab} <= "
        f"{MIN_ARRAY_PATH_VOCAB}")
    mean_len = sum(len(t.split()) for t in texts) / len(texts)
    assert mean_len > 200, (
        f"longdoc corpus must be LONG-record: mean {mean_len:.0f} "
        f"tokens/doc <= 200")

    os.makedirs(OUT, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(table, os.path.join(OUT, "documents.parquet"))
    print(f"documents: {len(doc_ids)} rows, vocab V={vocab}, mean "
          f"{mean_len:.0f} tokens/doc -> {OUT}")


if __name__ == "__main__":
    main()
