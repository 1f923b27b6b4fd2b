"""Engine operators, grouped by SURVEY §2 category:

- :mod:`.relational`  — filters/projections (P1-P9), joins (J1/J2 + full
  join-type surface), set ops (U1 + intersect/except), sort/limit/top-k
  (O1/O2)
- :mod:`.aggregates`  — group medians (A1), scalar aggs (A3/A6), correlation
  (A4), RMSE (A5), rollup/cube/grouping sets, sketches (X6)
- :mod:`.windows`     — arg-max latest-per-group (P5/A2), ranking, frames
- :mod:`.dedup`       — exact (X1) + MinHash-LSH / SimHash / n-gram Jaccard
  near-dedup (X2)
- :mod:`.similarity`  — embedding similarity search (X3)
- :mod:`.retrieval`   — BM25 lexical scoring / top-k retrieval (RAG stack)
- :mod:`.text`        — text analysis: lang-id, quality, tokens, fingerprints (X4)
- :mod:`.multimodal`  — binary/multimodal column plumbing (X5)
- :mod:`.asof`        — as-of / range joins (SURVEY §2.3 extension)
"""
