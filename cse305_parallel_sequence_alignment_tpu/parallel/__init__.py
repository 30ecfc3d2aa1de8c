"""Device-mesh execution: many-pairs sharding, balanced partition,
long-sequence pipeline."""
