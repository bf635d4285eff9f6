"""Metric parity and property tests.

PSNR protocols are validated against a direct numpy transcription of the
reference math (sr_module.py:21-38); SSIM against an independent numpy
implementation of the torchmetrics convention.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_diinn.train import metrics as M


def ref_calc_psnr(sr, hr, dataset=None, scale=1):
    diff = sr - hr
    if dataset == "benchmark":
        shave = int(scale)
        conv = np.array([65.738, 129.057, 25.064]) / 256
        diff = (diff * conv).sum(axis=-1, keepdims=True)
        diff = diff[..., shave:-shave, shave:-shave, :]
    elif dataset == "div2k":
        shave = int(scale) + 6
        diff = diff[..., shave:-shave, shave:-shave, :]
    mse = (diff ** 2).mean()
    return -10 * np.log10(mse)


@pytest.mark.parametrize("dataset,scale", [
    (None, 1), ("benchmark", 2), ("benchmark", 3.5), ("div2k", 4),
])
def test_calc_psnr_protocols(dataset, scale):
    rng = np.random.default_rng(3)
    hr = rng.random((1, 40, 50, 3)).astype(np.float32)
    sr = np.clip(hr + 0.05 * rng.standard_normal(hr.shape), 0, 1
                 ).astype(np.float32)
    got = float(M.calc_psnr(jnp.asarray(sr), jnp.asarray(hr), dataset, scale))
    want = ref_calc_psnr(sr.astype(np.float64), hr.astype(np.float64),
                         dataset, scale)
    assert abs(got - want) < 1e-3


def test_psnr_basic():
    hr = np.zeros((1, 8, 8, 3), np.float32)
    sr = hr + 0.1
    got = float(M.psnr(jnp.asarray(sr), jnp.asarray(hr)))
    assert abs(got - 20.0) < 1e-4


def numpy_ssim(sr, hr, data_range=1.0, size=11, sigma=1.5):
    """Independent SSIM oracle (torchmetrics convention, reflect pad)."""
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-x ** 2 / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):
        from scipy.signal import convolve2d
        pad = (size - 1) // 2
        p = np.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
        return convolve2d(p, win, mode="valid")

    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for c in range(sr.shape[-1]):
        xs, ys = sr[0, ..., c], hr[0, ..., c]
        mx, my = filt(xs), filt(ys)
        sx = filt(xs * xs) - mx * mx
        sy = filt(ys * ys) - my * my
        sxy = filt(xs * ys) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
        vals.append(s.mean())
    return np.mean(vals)


def test_ssim_identity_and_oracle():
    rng = np.random.default_rng(5)
    hr = rng.random((1, 32, 40, 3)).astype(np.float32)
    sr = np.clip(hr + 0.08 * rng.standard_normal(hr.shape), 0, 1
                 ).astype(np.float32)
    assert abs(float(M.ssim(jnp.asarray(hr), jnp.asarray(hr))) - 1.0) < 1e-5
    got = float(M.ssim(jnp.asarray(sr), jnp.asarray(hr)))
    want = numpy_ssim(sr.astype(np.float64), hr.astype(np.float64))
    assert abs(got - want) < 1e-4
    assert got < 1.0


def test_ssim_ordering():
    rng = np.random.default_rng(6)
    hr = rng.random((1, 32, 32, 3)).astype(np.float32)
    near = np.clip(hr + 0.01 * rng.standard_normal(hr.shape), 0, 1)
    far = np.clip(hr + 0.2 * rng.standard_normal(hr.shape), 0, 1)
    assert float(M.ssim(jnp.asarray(near, dtype=jnp.float32),
                        jnp.asarray(hr))) > \
        float(M.ssim(jnp.asarray(far, dtype=jnp.float32), jnp.asarray(hr)))


def test_lr_psnr_perfect_cycle():
    rng = np.random.default_rng(7)
    hr = rng.random((1, 48, 48, 3)).astype(np.float32)
    val = float(M.lr_psnr(jnp.asarray(hr), jnp.asarray(hr), 3.0))
    assert val > 80  # identical inputs -> near-infinite PSNR
