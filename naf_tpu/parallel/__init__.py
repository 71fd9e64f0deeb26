"""Multi-chip scaling: mesh/shard_map block pipeline and carry algebra."""
