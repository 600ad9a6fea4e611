"""IO, datasets, logging, metrics."""
