"""Antialiased bicubic resize as separable weight-matrix matmuls.

The reference pipeline resizes exclusively with torchvision's antialiased
bicubic (``srdata.py:163-166``, ``sr_module.py:16-19,53-60``): it defines the
training LR distribution, the bicubic baseline model, and the LR-PSNR metric.
MATLAB-convention ``imresize`` (``src/utils/matlab_imresize.py``) is the
classical kernel for benchmark LR generation. Both are provided here.

TPU-first design: a 1-D resize n_in -> n_out is a fixed linear map, so we
precompute a dense (n_out, n_in) weight matrix on the host (numpy, float64)
and apply the 2-D resize as two matmuls over the H and W axes of an NHWC
tensor. Static shapes, MXU-friendly, trivially differentiable (the VJP is the
transposed matmul), and bit-stable across devices.

Weight-matrix construction follows the published algorithms:

- ``kernel='torch'``: PyTorch/PIL antialiased bicubic (cubic a=-0.5; kernel
  support scaled by in/out when downsampling; boundary taps clipped and
  weights renormalized). Matches ``F.interpolate(mode='bicubic',
  antialias=True)`` which torchvision's ``transforms.Resize(antialias=True)``
  dispatches to for tensors.
- ``kernel='matlab'``: MATLAB ``imresize`` semantics (cubic a=-0.5, antialiased
  when downsampling, mirrored boundary indices) per the algorithm in the
  reference's ``matlab_imresize.py:23-51``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray

_CUBIC_A = -0.5  # PIL/MATLAB convention; torch non-AA bicubic uses -0.75.


def _cubic(x: np.ndarray, a: float = _CUBIC_A) -> np.ndarray:
    x = np.abs(x.astype(np.float64))
    x2 = x * x
    x3 = x2 * x
    inner = (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0
    outer = a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a
    return np.where(x <= 1.0, inner, np.where(x < 2.0, outer, 0.0))


@functools.lru_cache(maxsize=4096)
def resize_matrix(n_in: int, n_out: int, kernel: str = "torch",
                  antialias: bool = True) -> np.ndarray:
    """Dense (n_out, n_in) float64 resize weight matrix for one axis."""
    if kernel == "torch":
        return _torch_aa_matrix(n_in, n_out, antialias)
    if kernel == "matlab":
        return _matlab_matrix(n_in, n_out, antialias)
    raise ValueError(f"unknown resize kernel: {kernel!r}")


def _torch_aa_matrix(n_in: int, n_out: int, antialias: bool) -> np.ndarray:
    scale = n_in / n_out
    if antialias and scale >= 1.0:
        support = 2.0 * scale
        invscale = 1.0 / scale
    else:
        support = 2.0
        invscale = 1.0
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        center = scale * (i + 0.5)
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), n_in)
        j = np.arange(lo, hi, dtype=np.float64)
        w = _cubic((j - center + 0.5) * invscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        mat[i, lo:hi] = w
    return mat


def _matlab_matrix(n_in: int, n_out: int, antialias: bool) -> np.ndarray:
    scale = n_out / n_in
    kernel_width = 4.0
    if antialias and scale < 1.0:
        kernel_width = kernel_width / scale
        kern = lambda x: scale * _cubic(scale * x)
    else:
        kern = _cubic
    # 1-based output coordinates mapped into input space.
    x = np.arange(1, n_out + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(np.ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(p)[None, :] - 1  # 0-based tap indices
    w = kern(u[:, None] - ind - 1.0)
    w = w / w.sum(axis=1, keepdims=True)
    # Mirror out-of-range indices: 0,1,...,n-1,n-1,...,1,0 cycle.
    aux = np.concatenate([np.arange(n_in), np.arange(n_in - 1, -1, -1)])
    ind = aux[np.mod(ind.astype(np.int64), aux.size)]
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        np.add.at(mat[i], ind[i], w[i])
    return mat


def resize(x: Array, size: tuple[int, int], *, kernel: str = "torch",
           antialias: bool = True, dtype=None) -> Array:
    """Bicubic-resize an (..., H, W, C) tensor to ``size`` (H_out, W_out).

    Applied as two matmuls (H axis then W axis). ``dtype`` controls the
    compute/output dtype (default: x.dtype).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = int(size[0]), int(size[1])
    out_dtype = dtype or x.dtype
    wh = jnp.asarray(resize_matrix(h_in, h_out, kernel, antialias),
                     dtype=jnp.float32)
    ww = jnp.asarray(resize_matrix(w_in, w_out, kernel, antialias),
                     dtype=jnp.float32)
    # HIGHEST: TPU matmuls default to bf16-truncated inputs; resize feeds
    # metrics (LR-PSNR) and data-prep parity paths, which need true fp32
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,...hwc->...hoc", ww, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(out_dtype)


def resize_np(x: np.ndarray, size: tuple[int, int], *, kernel: str = "torch",
              antialias: bool = True) -> np.ndarray:
    """Host-side (numpy) variant of :func:`resize` for data pipelines.

    Same weight matrices, float32 accumulation, (..., H, W, C) layout.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = int(size[0]), int(size[1])
    wh = resize_matrix(h_in, h_out, kernel, antialias).astype(np.float32)
    ww = resize_matrix(w_in, w_out, kernel, antialias).astype(np.float32)
    y = np.einsum("oh,...hwc->...owc", wh, x.astype(np.float32))
    return np.einsum("ow,...hwc->...hoc", ww, y)


def resize_by_scale_size(size: tuple[int, int], scale: float) -> tuple[int, int]:
    """Output size convention of the reference data pipeline:
    ``round(H / scale)`` per axis (``srdata.py:225-227``,
    ``sr_module.py:170-172``)."""
    return (int(round(size[0] / scale)), int(round(size[1] / scale)))
