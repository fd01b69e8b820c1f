# 2D mode: boolean fill image, like the reference GUI's 2D setting.
SIZE = 512
MODE = "2d"

shapes = [difference(circle(0.9), circle(0.7)),
          rectangle(-0.15, 0.15, -0.6, 0.6),
          rotate_z(rectangle(-0.15, 0.15, -0.6, 0.6), 1.5707963)]
