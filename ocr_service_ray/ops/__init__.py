"""Training-data-scale operators over generic tables.

Beyond the reference's own operator inventory (SURVEY.md §2), these
are the operations a 100 TB training-data pipeline needs as
first-class components: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding near-dup), similarity search (brute-force
and IVF), text analysis (token stats, language ID, quality scoring,
fingerprinting), relational building blocks (broadcast + partitioned
hash joins, top-k, windowed aggregates, sessionization), and the
multimodal binary-column plumbing.
"""
