"""Evaluation metrics: PSNR (three protocols), SSIM, LR-PSNR.

Pure-JAX re-implementations of the reference's metric stack
(``src/models/sr_module.py:21-38,159-180``):

- ``psnr``: torchmetrics-style PSNR — RGB, data_range=1, MSE over the whole
  batch (``sr_module.py:167``).
- ``calc_psnr`` protocol ``'benchmark'``: luma-weighted gray conversion
  (coeffs 65.738/129.057/25.064 / 256) and border shave of ``int(scale)``
  (``sr_module.py:24-29``) — the paper-table protocol.
- ``calc_psnr`` protocol ``'div2k'``: RGB with shave ``int(scale)+6``
  (``sr_module.py:30-34``) — the validation protocol.
- ``ssim``: torchmetrics ``structural_similarity_index_measure`` convention:
  11x11 gaussian window (sigma 1.5), k1=0.01/k2=0.03, reflect padding, mean
  over the full-size per-pixel map (``sr_module.py:169``).
- ``lr_psnr``: cycle consistency — PSNR between antialiased-bicubic
  downsamples of SR and HR at the LR size (``sr_module.py:170-175``).

All functions take NHWC arrays and are jittable (shave/scale are static).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
import jax.lax

from tpu_diinn.core.resize import resize, resize_by_scale_size

Array = jnp.ndarray

GRAY_COEFFS = (65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0)


def psnr(sr: Array, hr: Array, data_range: float = 1.0) -> Array:
    """Whole-batch PSNR, RGB (torchmetrics convention)."""
    mse = jnp.mean((sr.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def calc_psnr(sr: Array, hr: Array, dataset: str | None = None,
              scale: float = 1, rgb_range: float = 1) -> Array:
    """Shave-protocol PSNR (reference ``calc_psnr``, sr_module.py:21-38)."""
    diff = (sr.astype(jnp.float32) - hr.astype(jnp.float32)) / rgb_range
    if dataset is not None:
        if dataset == "benchmark":
            shave = int(scale)
            if diff.shape[-1] > 1:
                conv = jnp.asarray(GRAY_COEFFS, dtype=diff.dtype)
                diff = jnp.sum(diff * conv, axis=-1, keepdims=True)
        elif dataset == "div2k":
            shave = int(scale) + 6
        else:
            raise NotImplementedError(dataset)
        if shave > 0:
            diff = diff[..., shave:-shave, shave:-shave, :]
    mse = jnp.mean(diff ** 2)
    return -10.0 * jnp.log10(mse)


@functools.lru_cache(maxsize=16)
def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: Array, size: int, sigma: float) -> Array:
    """Separable valid-mode gaussian filter over H, W of an NHWC tensor."""
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    c = x.shape[-1]
    # depthwise conv via feature_group_count
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    # HIGHEST precision is load-bearing on TPU: the default bf16 conv
    # truncation makes the SSIM variance f(x^2) - mu^2 cancel
    # catastrophically (negative variances -> SSIM > 1 on real images)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return x


def ssim(sr: Array, hr: Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> Array:
    """Mean SSIM, torchmetrics convention (reflect pad, gaussian window)."""
    pad = (kernel_size - 1) // 2
    mode = "reflect"
    x = jnp.pad(sr.astype(jnp.float32),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    y = jnp.pad(hr.astype(jnp.float32),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    f = lambda t: _gaussian_filter(t, kernel_size, sigma)
    mu_x, mu_y = f(x), f(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = f(x * x) - mu_x2
    sig_y = f(y * y) - mu_y2
    sig_xy = f(x * y) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


def lr_psnr(sr: Array, hr: Array, scale: float,
            data_range: float = 1.0) -> Array:
    """Cycle-consistency PSNR at the LR size (sr_module.py:170-175)."""
    size = resize_by_scale_size((hr.shape[-3], hr.shape[-2]), scale)
    return psnr(resize(sr, size), resize(hr, size), data_range)
