"""Vectorized kernels for text analysis, dedup sketches, similarity search."""
