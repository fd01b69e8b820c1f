"""Render pipelines: staged 2D/3D (culling + tape shortening) and brute."""

from .pipeline2d import render2d
from .pipeline3d import render3d
from .brute import render2d_brute, render3d_brute, build_unrolled_f
from . import camera

__all__ = ["render2d", "render3d", "render2d_brute", "render3d_brute",
           "build_unrolled_f", "camera"]
