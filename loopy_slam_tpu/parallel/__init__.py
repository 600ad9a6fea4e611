"""Device-mesh sharding: multi-chip scale-out of rendering and mapping."""
