# Archimedean spiral ribbon — exercises the extended-op lowering
# (atan2 has no reference GPU opcode; src/tape.cpp:182-196 errors on it,
# here it compiles via frontend/tree.py::lower_extended).  The lowered
# atan2 leaves a hairline NaN seam on the negative-x axis (documented);
# the ribbon is rotated so the seam crosses empty space.
SIZE = 512
MODE = "2d"

theta = Tree("atan2", y(), x())
r = sqrt(square(x()) + square(y()))
# distance (in r) to the nearest spiral arm r = a*(theta + 2*pi*k)
a = 0.048
turns = (r / a - theta) * (1.0 / 6.283185307179586)
# fractional part via sin: arm distance proxy, thickness by threshold
arm = sin(turns * 6.283185307179586) * (a * 0.5)
shape = maximum(abs_(arm) - a * 0.18, r - 0.92)
