"""Pure math ops: camera geometry, pixel sampling, volume compositing, k-NN."""
