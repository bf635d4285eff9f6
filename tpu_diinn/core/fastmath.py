"""Fast transcendentals for the sine-activated decoder.

DIINN's synthesis branch applies ``sin`` to (B, H_out, W_out, 256) tensors
every layer (reference ``diinn.py:21-26``) — ~300M sine evaluations per
training step. On TPU the stock lowering runs at ~33 Gelem/s on the VPU
(both XLA and Mosaic), which makes the *activation function* the decoder's
bottleneck, ahead of all matmuls. A degree-11 odd minimax polynomial with a
two-term Cody-Waite range reduction is ~2x faster and accurate to 1.4e-6
absolute over |x| <= 40 (fp32 rounding floor — far below conv-stack noise).

``fast_sin`` carries a custom JVP whose tangent uses ``fast_cos`` (the
analytic derivative), so autodiff stays fast and consistent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_INV_TWO_PI = 0.15915494309189535
_TWO_PI_HI = 6.2831855            # fp32(2*pi)
_TWO_PI_LO = -1.7484555e-07       # 2*pi - fp32(2*pi)
_HALF_PI = 1.5707963267948966

# Degree-11 odd minimax fit of sin on [-pi, pi] (max poly err 9.6e-8).
_SIN_COEFFS = (
    9.9999959990e-01,
    -1.6666552631e-01,
    8.3324029612e-03,
    -1.9808632624e-04,
    2.6997138288e-06,
    -2.0362212148e-08,
)


# Degree-12 even minimax fit of cos on [-pi, pi] (max poly err 4.0e-8),
# sharing _poly_sin's range reduction so sin+cos of the same argument (the
# decoder backward needs both) costs one reduction and two polynomials.
_COS_COEFFS = (
    9.9999995963e-01,
    -4.9999978455e-01,
    4.1666391842e-02,
    -1.3887438022e-03,
    2.4763353977e-05,
    -2.7023758023e-07,
    1.7066625985e-09,
)


def _poly_sin(x: Array) -> Array:
    x = x.astype(jnp.float32)
    n = jnp.round(x * _INV_TWO_PI)
    r = x - n * _TWO_PI_HI - n * _TWO_PI_LO
    r2 = r * r
    acc = jnp.float32(_SIN_COEFFS[-1])
    for c in _SIN_COEFFS[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    return r * acc


def _poly_sincos(x: Array):
    """(sin x, cos x) with a single shared range reduction."""
    x = x.astype(jnp.float32)
    n = jnp.round(x * _INV_TWO_PI)
    r = x - n * _TWO_PI_HI - n * _TWO_PI_LO
    r2 = r * r
    acc = jnp.float32(_SIN_COEFFS[-1])
    for c in _SIN_COEFFS[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    s = r * acc
    acc = jnp.float32(_COS_COEFFS[-1])
    for c in _COS_COEFFS[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    return s, acc


@jax.custom_jvp
def fast_sin(x: Array) -> Array:
    return _poly_sin(x).astype(x.dtype)


@jax.custom_jvp
def fast_cos(x: Array) -> Array:
    return _poly_sin(x.astype(jnp.float32) + _HALF_PI).astype(x.dtype)


@fast_sin.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return fast_sin(x), fast_cos(x) * t


@fast_cos.defjvp
def _fast_cos_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return fast_cos(x), -fast_sin(x) * t
