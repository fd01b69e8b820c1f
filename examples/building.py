# Architectural massing study — the analog of gui/examples/architecture.io
# (a building from unioned boxes/cylinders with directives).
SIZE = 512
MODE = "ssao"
VIEW = (0.6, -1.05, 0.3)

slab = box(-0.8, 0.8, -0.6, 0.6, -0.9, -0.7)
tower = box(-0.35, 0.35, -0.3, 0.3, -0.7, 0.55)
setback = box(-0.25, 0.25, -0.22, 0.22, 0.55, 0.8)
column = cylinder_z(0.05, -0.9, -0.7)
cols = union(*[move(column, dx, dy, 0.0)
               for dx in (-0.6, 0.0, 0.6) for dy in (-0.45, 0.45)])
arch = difference(tower, move(cylinder_z(0.18, -0.75, 0.2), 0.0, -0.4, 0.0))
shape = union(slab, arch, setback, cols)
