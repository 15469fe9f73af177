"""Operators a large-scale training-data pipeline needs on top of the graph
engine: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality, tokens, fingerprints), and multimodal
column plumbing (binary payloads + pandas-UDF decode)."""
