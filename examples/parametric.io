; Parametric CSG demo: every (var ...) below appears as a live slider
; in the viewer (python -m mpr_tpu.viewer examples/parametric.io
; --serve 8000).  Slider moves are pure immediate-vector overrides, so
; the interp engine re-renders with no recompilation; `cli fit
; --params-only` can drive the same vars by gradient descent.
(define body (sphere (var radius 0.72 0.4 0.95)))
(define bore (cylinder-z (var bore-r 0.3 0.05 0.6) 2.4 (list 0 0 -1.2)))
(define cut (rotate-y bore (var tilt 0.5 0 1.5707963)))
(difference body bore cut (reflect-x cut))
