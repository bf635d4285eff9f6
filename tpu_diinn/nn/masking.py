"""Valid-extent masking: run shape-padded images through conv stacks with
boundary semantics identical to the true-shape run.

Motivation (SURVEY.md §7.3, round-4 verdict): full-image benchmark eval
compiles one TPU program per distinct image shape — hundreds of multi-minute
remote compiles across Urban100/B100. Padding every LR image up to a small
set of bucket shapes fixes the compile count, but naive zero-padding changes
the numbers: a SAME conv on the padded canvas produces nonzero activations
(bias, relu) inside the pad region which bleed back into the interior at the
next layer, so features within the encoder's receptive field of the true
boundary would differ from the unpadded run.

The fix is exact and cheap: mask every conv output to zero outside the true
extent. Then each conv's *input* is zero beyond the true boundary at every
layer — precisely what SAME zero-padding at the true image edge provides —
so every interior activation is bit-identical to the unpadded run, while the
true extent stays a *traced* scalar (no recompile per shape).

Usage:

    with valid_extent((h_pad, w_pad), h_true, w_true):   # h/w_true traced
        feat = encoder.apply(params, x_padded)

``layers.Conv`` / ``layers.MeanShift`` call :func:`apply_valid_mask` on
their outputs; outside the context it is a no-op. Resolution changes inside
the stack (PixelShuffle) are handled by scaling the extent with the static
shape ratio.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Holds (base_hw, h_valid, w_valid) during tracing of a masked apply; the
# valid extents may be Python ints or traced int32 scalars.
_EXTENT: contextvars.ContextVar[Optional[Tuple[Tuple[int, int], Any, Any]]] \
    = contextvars.ContextVar("tpu_diinn_valid_extent", default=None)


@contextlib.contextmanager
def valid_extent(base_hw: Tuple[int, int], h_valid, w_valid):
    """Scope under which conv outputs are zeroed outside (h_valid, w_valid).

    ``base_hw`` is the static (H, W) of the tensors the extents refer to
    (the padded canvas at input resolution)."""
    tok = _EXTENT.set((tuple(base_hw), h_valid, w_valid))
    try:
        yield
    finally:
        _EXTENT.reset(tok)


def _scaled(v, n_cur: int, n_base: int):
    """Valid extent at a resolution ``n_cur`` when the base canvas is
    ``n_base`` — conv stacks only rescale by integer factors
    (PixelShuffle / strided pooling)."""
    if n_cur == n_base:
        return v
    if n_cur > n_base:
        assert n_cur % n_base == 0, (n_cur, n_base)
        return v * (n_cur // n_base)
    assert n_base % n_cur == 0, (n_cur, n_base)
    return v // (n_base // n_cur)


def apply_valid_mask(y: Array) -> Array:
    """Zero ``y`` (..., H, W, C) outside the current valid extent (no-op
    when no :func:`valid_extent` scope is active)."""
    ctx = _EXTENT.get()
    if ctx is None:
        return y
    (h0, w0), h_v, w_v = ctx
    h, w = y.shape[-3], y.shape[-2]
    hv = _scaled(h_v, h, h0)
    wv = _scaled(w_v, w, w0)
    ih = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    mask = (ih < hv) & (iw < wv)
    return y * mask[..., None].astype(y.dtype)


def masking_active() -> bool:
    return _EXTENT.get() is not None
