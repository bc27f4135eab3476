"""DataFrame-level operators: LSH, verification, components, substring, dedup, ANN."""
