"""Operator library: algorithms beyond stock DataFrame calls.

Everything here is built as compositions of built-in JVM-side
expressions (higher-order array functions, hash functions, window
specs) — no row-at-a-time Python in any hot path, per the
UDFs-are-the-slow-path rule. Modules:

- :mod:`.dedup` — exact, n-gram Jaccard, MinHash-LSH, SimHash
- :mod:`.similarity` — brute-force + LSH cosine top-k over embeddings
- :mod:`.text` — tokenization, quality features, language-ID
- :mod:`.mrcompat` — the reference's literal streaming-UDF lane
- :mod:`.multimodal` — binary-column plumbing (decode stubbed)
"""
