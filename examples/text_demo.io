;; Native Scheme scene (the reference GUI's .io format) exercising the
;; vector stroke font: extruded text wrapped onto a sphere cap, plus a
;; CSG base — open with
;;   python -m mpr_tpu.viewer examples/text_demo.io --serve 8000
(define plate
  (sequence
    (rectangle [-1.5 -0.55] [1.5 0.75])
    (extrude-z -0.12 -0.06)))

(define label
  (sequence
    (text "mpr tpu" [0 0])
    (move [-1.35 -0.3])
    (scale-xyz [0.55 0.55 1])
    (extrude-z -0.08 0.1)))

(sequence
  (union label (difference plate (offset label 0.04)))
  (intersection (scale-z (sphere 1.9) 0.5))
  (rotate-x -0.25)
  (scale-xyz [0.6 0.6 0.6])
  )
