"""End-to-end pipelines (flagship webtext, relational suite, dedup, similarity)."""
