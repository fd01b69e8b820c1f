# Live-viewer example (the analog of gui/examples/hello_world.io:
# extruded 2D shape intersected with a sphere).
SIZE = 512
MODE = "shaded"

ring2d = difference(circle(0.8), circle(0.5))
shape = intersection(extrude_z(ring2d, -0.3, 0.3), sphere(0.85))
