"""Bucketed static-shape eval == exact per-shape eval (train/bucketed.py).

The whole point of the bucketed path is that padding an image onto a bucket
canvas changes NOTHING but the fp32 summation order of the metric means:
- masked conv stacks (nn/masking.py) reproduce SAME-pad boundary semantics,
- decode_traced with host-built index arrays reproduces the static decode,
- masked metrics reproduce their exact-shape counterparts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_diinn.config.config import load_config
from tpu_diinn.core import grids
from tpu_diinn.core.resize import resize_matrix, resize_by_scale_size
from tpu_diinn.nn.masking import valid_extent
from tpu_diinn.nn.registry import make_encoder
from tpu_diinn.train import loop
from tpu_diinn.train import metrics as M
from tpu_diinn.train.bucketed import BucketedEval, _pad_to, _syn_np


def _rand_img(rng, h, w):
    return rng.random((1, h, w, 3)).astype(np.float32)


def test_masked_metrics_match_exact():
    rng = np.random.default_rng(0)
    sr, hr = _rand_img(rng, 37, 29), _rand_img(rng, 37, 29)
    srp, hrp = _pad_to(sr, (1, 64, 64, 3)), _pad_to(hr, (1, 64, 64, 3))
    hv, wv = np.int32(37), np.int32(29)

    np.testing.assert_allclose(M.psnr_masked(srp, hrp, hv, wv),
                               M.psnr(sr, hr), rtol=1e-6)
    np.testing.assert_allclose(M.ssim_masked(srp, hrp, hv, wv),
                               M.ssim(sr, hr), rtol=1e-5)

    scale = 2.0
    hl, wl = resize_by_scale_size((37, 29), scale)
    mh = _pad_to(resize_matrix(37, hl).astype(np.float32), (32, 64))
    mw = _pad_to(resize_matrix(29, wl).astype(np.float32), (32, 64))
    np.testing.assert_allclose(
        M.lr_psnr_masked(srp, hrp, mh, mw, np.int32(hl), np.int32(wl)),
        M.lr_psnr(sr, hr, scale), rtol=1e-5)


def test_valid_extent_masked_encoder_matches_unpadded():
    enc = make_encoder("rdn-tiny")
    rng = np.random.default_rng(1)
    x = jnp.asarray(_rand_img(rng, 24, 20))
    params = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(params, x)

    xp = jnp.asarray(_pad_to(np.asarray(x), (1, 32, 32, 3)))
    with valid_extent((32, 32), jnp.int32(24), jnp.int32(20)):
        got = enc.apply(params, xp)
    np.testing.assert_allclose(np.asarray(got[:, :24, :20]),
                               np.asarray(ref), atol=1e-6, rtol=1e-6)
    # pad region is fully zeroed
    assert float(jnp.abs(got[:, 24:]).max()) == 0.0
    assert float(jnp.abs(got[:, :, 20:]).max()) == 0.0


def test_syn_np_matches_traced_grid():
    syn_np = _syn_np((11, 13), (26, 40))
    syn_j = np.asarray(grids.syn_input_grid((11, 13), (26, 40)))
    np.testing.assert_allclose(syn_np, syn_j, atol=1e-7, rtol=1e-7)


@pytest.mark.parametrize("scale,lr_hw,hr_hw", [
    (2.0, (21, 17), (42, 34)),          # integer ratio
    (2.5, (21, 17), (53, 43)),          # non-integer, round(H/s) = lr
])
def test_bucketed_eval_matches_exact(scale, lr_hw, hr_hw):
    cfg = load_config(None, [
        "model.arch=diinn", "model.encoder=rdn-tiny",
        "model.hidden_dims=[32,32,32]", "model.eval_bsize=997",
    ])
    task = loop.build_task(cfg)
    rng = np.random.default_rng(2)
    lr = _rand_img(rng, *lr_hw)
    hr = _rand_img(rng, *hr_hw)
    params = task.net.init(jax.random.PRNGKey(1), jnp.asarray(lr), hr_hw)

    exact = loop.EvalJit(task).test_fn(scale, lr.shape, hr.shape)(
        params, jnp.asarray(lr), jnp.asarray(hr))
    ev = BucketedEval(task, quantum=32)
    got = ev.test_fn(scale, lr.shape, hr.shape)(params, lr, hr)
    for g, e, name in zip(got, exact, ("psnr", "ssim", "lr_psnr")):
        assert abs(float(g) - float(e)) < 1e-4, (name, float(g), float(e))
    # a second, differently-shaped image landing in the same bucket must
    # NOT create a new program
    n0 = ev.n_programs
    lr2 = _rand_img(rng, lr_hw[0] - 2, lr_hw[1] - 1)
    hr2_hw = (int(round((lr_hw[0] - 2) * scale)),
              int(round((lr_hw[1] - 1) * scale)))
    hr2 = _rand_img(rng, *hr2_hw)
    ev.metrics(params, lr2, hr2, scale)
    assert ev.n_programs == n0


def test_bucketed_kernel_variant_matches_exact():
    """Integer-scale bucketed eval through the 2-D tiled fused kernel
    (interpret mode on CPU) must agree with the exact-shape XLA eval."""
    cfg = load_config(None, [
        "model.arch=diinn", "model.encoder=rdn-tiny",
        "model.hidden_dims=[32,32,32]", "model.eval_bsize=997",
        "model.use_fused=true",
    ])
    task = loop.build_task(cfg)
    rng = np.random.default_rng(3)
    lr = _rand_img(rng, 19, 15)
    hr = _rand_img(rng, 38, 30)
    params = task.net.init(jax.random.PRNGKey(4), jnp.asarray(lr), (38, 30))

    ex_cfg = load_config(None, [
        "model.arch=diinn", "model.encoder=rdn-tiny",
        "model.hidden_dims=[32,32,32]", "model.eval_bsize=997",
        "model.use_fused=false",
    ])
    ex_task = loop.build_task(ex_cfg)
    exact = loop.EvalJit(ex_task).test_fn(2.0, lr.shape, hr.shape)(
        params, jnp.asarray(lr), jnp.asarray(hr))

    ev = BucketedEval(task, quantum=32, kernel=True)
    got = ev.metrics(params, lr, hr, 2.0)
    assert list(ev._jit)[0][0] == "kernel"
    for g, e, name in zip(got, exact, ("psnr", "ssim", "lr_psnr")):
        assert abs(float(g) - float(e)) < 5e-4, (name, float(g), float(e))


@pytest.mark.parametrize("arch,scale,lr_hw,hr_hw", [
    ("liif", 2.0, (21, 17), (42, 34)),
    ("liif", 2.5, (21, 17), (53, 43)),
    ("metasr", 2.0, (21, 17), (42, 34)),
    ("metasr", 2.5, (21, 17), (53, 43)),
])
def test_bucketed_eval_liif_metasr_matches_exact(arch, scale, lr_hw, hr_hw):
    """Round 5: the bucketed static-shape path covers ALL model families
    (LIIF's 4-corner ensemble and MetaSR's hypernet projection accept
    traced index/rel arrays)."""
    cfg = load_config(None, [
        f"model.arch={arch}", "model.encoder=rdn-tiny",
        "model.hidden_dims=[32,32]", "model.eval_bsize=997",
    ])
    task = loop.build_task(cfg)
    rng = np.random.default_rng(4)
    lr = _rand_img(rng, *lr_hw)
    hr = _rand_img(rng, *hr_hw)
    params = task.net.init(jax.random.PRNGKey(2), jnp.asarray(lr), hr_hw)

    exact = loop.EvalJit(task).test_fn(scale, lr.shape, hr.shape)(
        params, jnp.asarray(lr), jnp.asarray(hr))
    ev = BucketedEval(task, quantum=32)
    got = ev.test_fn(scale, lr.shape, hr.shape)(params, lr, hr)
    for g, e, name in zip(got, exact, ("psnr", "ssim", "lr_psnr")):
        assert abs(float(g) - float(e)) < 1e-3, (name, float(g), float(e))
