"""Checkpoint manifest + resumable partitioned runs."""
