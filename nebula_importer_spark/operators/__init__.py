"""Physical operators: mapping, statement rendering, triples, dedup,
similarity search, text analysis, skew-aware aggregation."""
