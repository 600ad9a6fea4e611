"""Offline visualization of submap corrections (reference
src/tools/get_mesh_video.py:94-399): renders the trajectory animation —
including the before/after-PGO jumps recorded in the
{seg:05d}_before/after_pgo checkpoints — as frames + MP4.

Thin CLI over tools/viz.py (the headless viewer), kept as a separate entry
point for reference CLI parity.
"""

from .viz import main

if __name__ == "__main__":
    main()
