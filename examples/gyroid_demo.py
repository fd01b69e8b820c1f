# Gyroid lattice clipped to a sphere (stress test for transcendentals).
SIZE = 512
MODE = "normals"
VIEW = (0.5, -0.9, 0.3)

shape = intersection(gyroid(0.4, 0.08), sphere(0.85))
