"""Large-scale data-pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, corpus/LM scoring,
sampling, sketches (HLL/CMS), tokenizer training, graph analytics,
fuzzy matching, as-of/range/salted joins, multimodal plumbing.

These are first-class components of the engine (BASELINE.json north star),
designed for the 100 TB regime: hash-based shuffles on short keys, banded
LSH instead of all-pairs joins, broadcast for small query sets, no
driver-side loops.
"""
