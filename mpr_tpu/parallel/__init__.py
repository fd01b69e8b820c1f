"""Multi-chip sharding: device meshes, sharded rendering, sharded fitting."""

from .sharded import make_mesh, render2d_sharded, make_fit_step

__all__ = ["make_mesh", "render2d_sharded", "make_fit_step"]
