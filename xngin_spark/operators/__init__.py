"""Beyond-reference operators for large-scale training-data pipelines.

The reference engine stops at relational algebra (SURVEY.md §2); these
modules add the operations a 100 TB text/multimodal pipeline needs,
built Spark-first: JVM-side built-in expressions wherever possible,
Arrow-batched pandas UDFs only where semantics demand Python.

    textstats   token counting, quality scoring, language-ID, fingerprints
    dedup       exact, minhash-LSH, simhash, n-gram Jaccard near-dup
    similarity  embedding cosine search: brute-force + LSH-bucketed
    multimodal  opaque-binary columns: schema, batching, decode plumbing
"""
