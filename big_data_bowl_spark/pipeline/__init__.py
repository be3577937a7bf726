from .dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_buckets
from .similarity import cosine_topk, lsh_bucketed_topk
from .text import fingerprint_documents, language_id, quality_features, token_counts

__all__ = [
    "exact_dedup", "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_buckets",
    "cosine_topk", "lsh_bucketed_topk",
    "fingerprint_documents", "language_id", "quality_features", "token_counts",
]
