"""Multi-chip scaling: stream-axis data parallelism and spatial sharding."""
