# CSG playground: sphere minus three axis cylinders.
SIZE = 512
MODE = "shaded"
VIEW = (0.7, -1.0, 0.3)

s = sphere(0.8)
hole = 0.35
cz = cylinder_z(hole, -1.0, 1.0)
cx = rotate_y(cz, 1.5707963)
cy = rotate_x(cz, 1.5707963)
shape = difference(difference(difference(s, cz), cx), cy)
