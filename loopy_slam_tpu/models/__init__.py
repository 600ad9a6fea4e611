"""Neural point decoders and the fused renderer."""

from .decoder import init_decoders, trainable_mask  # noqa: F401
