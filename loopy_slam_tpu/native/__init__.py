"""First-party native (C++) host kernels, built on demand via g++ + ctypes."""

from .build import get_lib  # noqa: F401
