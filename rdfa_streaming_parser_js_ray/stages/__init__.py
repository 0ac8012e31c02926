"""Ray Data stages (map_batches transforms and actor-pool stages)."""
