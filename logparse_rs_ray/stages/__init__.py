"""map_batches / actor-pool stage implementations."""
