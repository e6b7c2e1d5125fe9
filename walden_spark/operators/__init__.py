"""North-star operators: dedup, similarity search, text analysis,
multimodal plumbing, range joins, rollups, skew-aware aggregation."""
