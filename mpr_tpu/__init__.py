"""mpr_tpu: a TPU-native framework for massively parallel rendering of
closed-form implicit surfaces.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA implementation of Keeter, "Massively Parallel Rendering of Complex
Closed-Form Implicit Surfaces" (SIGGRAPH 2020) at /root/reference.

Layers (bottom-up; see SURVEY.md section 1 for the reference's layer map):

  frontend/  expression DSL (hash-consed trees), .frep archive I/O, shape lib
  tape/      tape compiler: Tree -> flat register program (struct-of-arrays)
  oracle.py  pure-NumPy reference interpreters (float / interval / deriv)
  ops/       Pallas TPU kernels: interval eval + shortening, voxel eval, AD
  render/    2D/3D staged render pipelines, brute-force baseline, effects
  parallel/  multi-chip sharding of the tile space (Mesh / shard_map)
  io/        PNG output and friends
"""

from .frontend import tree
from .frontend.tree import Tree, x, y, z, const, minimum, maximum, sqrt, square
from .frontend import frep
from .tape.tape import Tape, compile_tree
from .tape.opcodes import Op

__version__ = "0.1.0"
