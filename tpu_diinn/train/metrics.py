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


# ---------------------------------------------------------------------------
# Masked variants for bucketed (shape-padded) eval: the image occupies the
# top-left (h_v, w_v) corner of a padded static canvas, with h_v/w_v traced
# scalars. Each reproduces its exact-shape counterpart on the valid region
# (identical per-pixel values; only the fp32 summation order differs).
# ---------------------------------------------------------------------------


def _extent_mask(h: int, w: int, h_v, w_v) -> Array:
    ih = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return (ih < h_v) & (iw < w_v)


def psnr_masked(sr: Array, hr: Array, h_v, w_v,
                data_range: float = 1.0) -> Array:
    """Whole-batch RGB PSNR over the valid (h_v, w_v) region of padded
    NHWC canvases (masked counterpart of :func:`psnr`)."""
    b, h, w, c = sr.shape
    m = _extent_mask(h, w, h_v, w_v)[None, :, :, None]
    d = (sr.astype(jnp.float32) - hr.astype(jnp.float32)) * m
    n = (b * c) * (h_v * w_v)
    mse = jnp.sum(d * d) / n
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _reflect_indices(n_pad: int, n_v, pad: int) -> Array:
    """Gather indices emulating jnp.pad(..., mode='reflect') at the TRUE
    edge ``n_v`` (traced) on a padded canvas of static length ``n_pad``.
    Entries whose windows lie outside the valid region are clamped
    in-bounds (their values are masked out downstream)."""
    i = jnp.arange(-pad, n_pad + pad, dtype=jnp.int32)
    j = jnp.abs(i)
    j = jnp.where(j >= n_v, 2 * n_v - 2 - j, j)
    return jnp.clip(j, 0, n_pad - 1)


def ssim_masked(sr: Array, hr: Array, h_v, w_v, data_range: float = 1.0,
                kernel_size: int = 11, sigma: float = 1.5,
                k1: float = 0.01, k2: float = 0.03) -> Array:
    """Masked counterpart of :func:`ssim`: reflect padding happens at the
    traced true edge (as a gather), the SSIM map is computed over the full
    padded canvas, and the mean runs over valid window centers only —
    per-window values match the exact-shape metric."""
    pad = (kernel_size - 1) // 2
    h, w = sr.shape[1:3]
    ri = _reflect_indices(h, h_v, pad)
    ci = _reflect_indices(w, w_v, pad)
    x = sr.astype(jnp.float32)[:, ri][:, :, ci]
    y = hr.astype(jnp.float32)[:, ri][:, :, ci]
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
    smap = num / den
    b, hm, wm, c = smap.shape
    m = _extent_mask(hm, wm, h_v, w_v)[None, :, :, None]
    return jnp.sum(smap * m) / ((b * c) * (h_v * w_v))


def lr_psnr_masked(sr: Array, hr: Array, wh: Array, ww: Array,
                   hl_v, wl_v, data_range: float = 1.0) -> Array:
    """Masked counterpart of :func:`lr_psnr`: ``wh`` (h_lr_pad, H_pad) and
    ``ww`` (w_lr_pad, W_pad) are the antialiased-bicubic resize matrices for
    the TRUE sizes zero-padded onto the bucket canvas (built host-side by
    train/bucketed.py); (hl_v, wl_v) is the true LR extent."""
    prec = jax.lax.Precision.HIGHEST

    def down(t):
        t = jnp.einsum("oh,bhwc->bowc", wh, t.astype(jnp.float32),
                       precision=prec)
        return jnp.einsum("ow,bhwc->bhoc", ww, t, precision=prec)

    return psnr_masked(down(sr), down(hr), hl_v, wl_v, data_range)
