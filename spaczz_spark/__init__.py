"""spaczz_spark — a PySpark-native near-duplicate detection & clustering engine.

Re-expresses the query capabilities of gandersen101/spaczz (fuzzy/regex/token
matching over text) as a distributed, Spark-first pipeline:

    shingle -> MinHash(128) + SimHash(64) -> LSH banding -> exact verify
            -> connected components -> substring (partial-ratio) stage

plus the scalar similarity kernels (InDel ratio, token_sort/token_set,
fuzzy-regex count normalization) reimplemented from scratch with exact
golden-value parity against the reference's published test vectors
(reference: /root/reference, spaczz v0.6.1 — semantics only, no code reuse).

Subpackages
-----------
- ``ratios``        scalar similarity kernels (S1-S7 in SURVEY.md §2.1)
- ``tokenizer``     offset-preserving rule tokenizer (spaCy-blank-like)
- ``phrasesearch``  scan/optimize/overlap-filter search core (P1-P4)
- ``regexsearch``   fuzzy-regex search + predefined patterns (P5, S7, S8)
- ``functions``     vectorized pandas UDFs (shingles, minhash, simhash, ratios)
- ``operators``     DataFrame-level operators (lsh, verify, components, ...)
- ``sources``       checkpoint catalog (parquet+manifest, Iceberg-shaped API)
- ``plans``         the resumable dedup pipeline runner
"""

__version__ = "0.1.0"
