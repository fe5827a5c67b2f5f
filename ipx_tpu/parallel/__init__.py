"""Scale-out: batched scenario solving (vmap) and multi-chip sharding
(mesh + shard_map with XLA collectives)."""
