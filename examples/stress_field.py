# Long-tape stress scene: ~2.8k-clause pseudo-random blob field
# (scale n_blobs up to 1500 for the full 13.4k-clause benchmark model —
# the working analog of the reference's missing prospero_long.frep).
# 2D, so best viewed with MODE = "2d"; the interp engine renders it
# with no per-shape compile.
SIZE = 512
MODE = "2d"

shape = stress_2d(300)
