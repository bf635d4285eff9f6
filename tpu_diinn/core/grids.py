"""Coordinate-grid and index math for implicit-image decoding.

Pure, shape-static functions. These reproduce the *exact* scalar conventions of
the reference implementation (robotic-vision-lab/Dual-Interactive-Implicit-
Neural-Network) so that decoded images bit-match:

- pixel-center coordinate grids in [-1, 1]:
  ``coord[i] = -1 + 1/N + (2/N) * i``  (reference ``diinn.py:98-99``,
  ``liif.py:32-46``).
- PyTorch ``nearest-exact`` interpolation index map:
  ``src = clamp(floor((i + 0.5) * N_in / N_out), 0, N_in - 1)``
  (reference ``diinn.py:106,168`` — the in-code comment there notes that plain
  ``'nearest'`` rounding gives inconsistent results; the *exact* variant is
  load-bearing).
- relative coordinates scaled by the input grid extent (``diinn.py:107-108``).

Everything here is trivially jittable: shapes are Python ints, outputs are
jnp arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def pixel_center_coords(n: int, *, v0: float = -1.0, v1: float = 1.0,
                        dtype=jnp.float32) -> Array:
    """1-D pixel-center coordinates of ``n`` cells covering ``[v0, v1]``.

    ``coord[i] = v0 + r + 2*r*i`` with ``r = (v1 - v0) / (2n)``; for the
    default range this is ``-1 + 1/n + (2/n) * i``.
    """
    r = (v1 - v0) / (2 * n)
    return v0 + r + (2 * r) * jnp.arange(n, dtype=dtype)


def coord_grid(size: tuple[int, int], *, dtype=jnp.float32) -> Array:
    """(H, W, 2) grid of pixel-center (y, x) coordinates in [-1, 1]."""
    h, w = size
    ys = pixel_center_coords(h, dtype=dtype)
    xs = pixel_center_coords(w, dtype=dtype)
    return jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)


def nearest_exact_indices(n_in: int, n_out: int) -> np.ndarray:
    """PyTorch ``nearest-exact`` source indices for 1-D resize n_in -> n_out.

    ``idx[i] = min(n_in - 1, floor((i + 0.5) * n_in / n_out))``.

    Returned as a *numpy* int32 array: the map depends only on static shapes,
    so callers can fold it into gathers/one-hot matrices at trace time.
    """
    i = np.arange(n_out, dtype=np.float64)
    idx = np.floor((i + 0.5) * (n_in / n_out))
    return np.clip(idx, 0, n_in - 1).astype(np.int32)


def upsample_nearest_exact(x: Array, size: tuple[int, int]) -> Array:
    """Nearest-exact spatial resize of an NHWC tensor to ``size``.

    Equivalent to torch ``F.interpolate(x, size, mode='nearest-exact')``
    (reference ``diinn.py:106,168``) but in NHWC layout. Implemented as two
    static gathers, which XLA lowers to cheap dynamic-slice/concat code on TPU.
    """
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    rows = jnp.asarray(nearest_exact_indices(h_in, h_out))
    cols = jnp.asarray(nearest_exact_indices(w_in, w_out))
    return x[:, rows][:, :, cols]


def nearest_exact_onehot(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) 0/1 matrix S with S[i, nearest_exact(i)] = 1.

    Multiplying by S performs the nearest-exact gather; multiplying by S^T
    performs its adjoint (the segment-sum). Expressing the upsample this way
    keeps BOTH directions on the MXU — the autodiff VJP is the transposed
    matmul instead of a scatter-add, which XLA lowers poorly on TPU.
    """
    idx = nearest_exact_indices(n_in, n_out)
    s = np.zeros((n_out, n_in), dtype=np.float32)
    s[np.arange(n_out), idx] = 1.0
    return s


def upsample_nearest_exact_mm(x: Array, size: tuple[int, int],
                              dtype=None) -> Array:
    """Nearest-exact NHWC resize as two one-hot matmuls (MXU-friendly).

    Numerically identical to :func:`upsample_nearest_exact` (the one-hot
    rows select single elements), but with a matmul VJP. Preferred inside
    training graphs; the gather variant is fine for inference.
    """
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    ct = dtype or x.dtype
    sh = jnp.asarray(nearest_exact_onehot(h_in, h_out), dtype=ct)
    sw = jnp.asarray(nearest_exact_onehot(w_in, w_out), dtype=ct)
    # HIGHEST keeps this a true gather on TPU: default matmul precision
    # truncates fp32 operands to bf16, which would silently quantize the
    # selected values (the one-hot weights themselves are exact either way)
    prec = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", sh, x.astype(ct),
                   preferred_element_type=ct, precision=prec)
    return jnp.einsum("pw,bowc->bopc", sw, y, preferred_element_type=ct,
                      precision=prec)


def rel_coord_grid(in_size: tuple[int, int], out_size: tuple[int, int],
                   *, dtype=jnp.float32) -> Array:
    """(H_out, W_out, 2) relative-coordinate encoding of the DIINN decoder.

    For each HR query pixel: its own pixel-center coordinate minus the
    coordinate of its nearest-exact LR cell, with the y component scaled by
    H_in and the x component by W_in (reference ``diinn.py:94-110``). The two
    axes are separable, so this is computed as an outer sum of two 1-D arrays.
    """
    h_in, w_in = in_size
    h_out, w_out = out_size
    ys_out = pixel_center_coords(h_out, dtype=dtype)
    xs_out = pixel_center_coords(w_out, dtype=dtype)
    ys_in = pixel_center_coords(h_in, dtype=dtype)
    xs_in = pixel_center_coords(w_in, dtype=dtype)
    ry = (ys_out - ys_in[jnp.asarray(nearest_exact_indices(h_in, h_out))]) * h_in
    rx = (xs_out - xs_in[jnp.asarray(nearest_exact_indices(w_in, w_out))]) * w_in
    ry = jnp.broadcast_to(ry[:, None], (h_out, w_out))
    rx = jnp.broadcast_to(rx[None, :], (h_out, w_out))
    return jnp.stack([ry, rx], axis=-1)


def area_ratio(in_size: tuple[int, int], out_size: tuple[int, int]) -> float:
    """Scalar scale-conditioning channel: (H_in*W_in)/(H_out*W_out)
    (reference ``diinn.py:166``)."""
    return (in_size[0] * in_size[1]) / (out_size[0] * out_size[1])


def syn_input_grid(in_size: tuple[int, int], out_size: tuple[int, int],
                   *, dtype=jnp.float32) -> Array:
    """(H_out, W_out, 3) synthesis-branch input: [rel_y, rel_x, area_ratio]
    (reference ``diinn.py:163-167``). Batch-independent; callers broadcast."""
    rel = rel_coord_grid(in_size, out_size, dtype=dtype)
    ratio = jnp.full(rel.shape[:2] + (1,), area_ratio(in_size, out_size),
                     dtype=dtype)
    return jnp.concatenate([rel, ratio], axis=-1)


def cell_grid(out_size: tuple[int, int], *, dtype=jnp.float32) -> Array:
    """(2,) cell size (2/H_out, 2/W_out) used by LIIF/MetaSR
    (reference ``liif.py:48-57``)."""
    return jnp.asarray([2.0 / out_size[0], 2.0 / out_size[1]], dtype=dtype)


def nearest_grid_sample_indices(n_in: int, coords: np.ndarray) -> np.ndarray:
    """torch ``grid_sample(mode='nearest', align_corners=False)`` index map.

    ``grid_sample`` un-normalizes a coordinate c in [-1, 1] to
    ``(c + 1) * n/2 - 0.5`` and nearest-rounds with round-half-away semantics
    implemented as ``floor(x + 0.5)``, then clamps (reference ``liif.py:94-101``,
    ``metasr.py:86-94`` rely on this). ``coords`` is a float numpy array.
    """
    x = (coords + 1.0) * (n_in / 2.0) - 0.5
    idx = np.floor(x + 0.5)
    return np.clip(idx, 0, n_in - 1).astype(np.int32)
