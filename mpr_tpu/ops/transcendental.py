"""Branch-free f32 asin/acos/atan for Pallas TPU kernels.

Mosaic has no lowering for asin/acos/atan (verified empirically on v5e;
sin/cos/tan/exp/log/sqrt/tanh all exist).  These are Cephes-style
polynomial implementations (~2 ulp on f32), written with where-selects only
so they lower on the VPU.  Used by both the float and interval interpreter
kernels (the interval versions apply them to endpoints; all three are
monotonic on their domains).
"""

from __future__ import annotations

import jax.numpy as jnp

_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730951   # tan(pi/8)
_TAN_3PI_8 = 2.414213562373095   # tan(3pi/8)


def atan(x):
    """f32 arctangent via 3-interval Cephes reduction."""
    a = jnp.abs(x)
    big = a > _TAN_3PI_8
    mid = a > _TAN_PI_8
    safe_a = jnp.maximum(a, 1e-30)
    z = jnp.where(big, -1.0 / safe_a,
                  jnp.where(mid, (a - 1.0) / (a + 1.0), a))
    y = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))
    z2 = z * z
    p = ((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
         + 1.99777106478e-1) * z2 - 3.33329491539e-1
    r = y + z + z * z2 * p
    return jnp.sign(x) * r


def asin(x):
    """f32 arcsine; NaN outside [-1, 1] (matches numpy)."""
    a = jnp.abs(x)
    over = a > 0.5
    z_hi = 0.5 * (1.0 - a)
    v = jnp.where(over, jnp.sqrt(jnp.maximum(z_hi, 0.0)), a)
    z = jnp.where(over, z_hi, a * a)
    p = ((((4.2163199048e-2 * z + 2.4181311049e-2) * z
           + 4.5470025998e-2) * z + 7.4953002686e-2) * z
         + 1.6666752422e-1) * z * v + v
    r = jnp.where(over, _PI_2 - 2.0 * p, p)
    r = jnp.sign(x) * r
    return jnp.where(a > 1.0, jnp.float32(jnp.nan), r)


def acos(x):
    """f32 arccosine; NaN outside [-1, 1]."""
    return _PI_2 - asin(x)
