"""LLM-training-data pipeline operators (beyond the reference's surface).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + partition-pruned + LSH ANN), text analysis
(lang-id, quality, tokens, fingerprint), multimodal binary columns.  All are
DataFrame transforms designed for shuffle-scale — no driver-side data paths.
"""
