"""Large-scale training-data pipeline operators (no reference counterpart).

These are the LLM-data-pipeline extensions: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
text analysis (token stats, quality scoring, language heuristics,
fingerprinting), and multimodal column plumbing.

Design rules: everything is built-in-function DataFrame logic (JVM-side,
shuffle-aware — LSH banding instead of cross joins) except multimodal
decode, which is Arrow-batched ``mapInPandas`` by necessity.
"""
