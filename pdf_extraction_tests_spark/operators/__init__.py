"""Large-scale training-data pipeline operators.

Beyond the reference's own operator inventory (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language-ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

Everything hot-path is native Spark column expressions; hashing is
md5-derived 48-bit so every operator has an exact DuckDB oracle.
"""
