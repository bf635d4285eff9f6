"""Numerics tests: fused Pallas decoder vs the XLA reference path.

Runs in interpreter mode on CPU (conftest forces the cpu platform); the same
kernel compiles for TPU unchanged. Compares forward and the custom-VJP
backward (dz + all weight grads) against jax.grad through the flax
ImplicitDecoder hr_step path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_diinn.kernels.decoder_fused import decode_fused, pack_params
from tpu_diinn.nn.diinn import ImplicitDecoder
from tpu_diinn.core import grids


def setup(b=2, h_in=6, w_in=8, h_out=16, w_out=24, hidden=32, n_layers=3,
          seed=0):
    dec = ImplicitDecoder(in_channels=8, hidden_dims=(hidden,) * n_layers,
                          mode=3, init_q=False)
    key = jax.random.PRNGKey(seed)
    feat = jax.random.normal(key, (b, h_in, w_in, 8))
    params = dec.init(key, feat, (h_out, w_out))
    zs = dec.apply(params, feat, method=ImplicitDecoder.lr_features)
    # kernel contract (r5): z carries the per-layer kq biases, pre-folded
    # at LR resolution (mirrors diinn.lr_features_stacked)
    kp = pack_params(params["params"], n_layers=n_layers, dtype=jnp.float32)
    z = jnp.concatenate(zs, axis=-1) + _kq_bias_vec(kp, hidden)
    syn = grids.syn_input_grid((h_in, w_in), (h_out, w_out))
    return dec, params, feat, zs, z, syn, kp


def _kq_bias_vec(kp, hidden):
    """(C_all,) vector: zeros for layer 0, bkq_i on band i (i >= 1)."""
    return jnp.concatenate([jnp.zeros((hidden,)), kp["bkq"].reshape(-1)])


def xla_out(dec, params, zs, syn, b, h_out, w_out):
    zs_hr = tuple(grids.upsample_nearest_exact_mm(zz, (h_out, w_out))
                  for zz in zs)
    syn_b = jnp.broadcast_to(syn[None], (b, h_out, w_out, 3))
    return dec.apply(params, zs_hr, syn_b, method=ImplicitDecoder.hr_step)


@pytest.mark.parametrize("shape", [
    (2, 6, 8, 16, 24),      # non-divisible tile path (16 rows, tile 16)
    (1, 5, 7, 22, 26),      # non-integer scale
])
def test_fused_forward_matches_xla(shape):
    b, h_in, w_in, h_out, w_out = shape
    dec, params, feat, zs, z, syn, kp = setup(b, h_in, w_in, h_out, w_out)
    got = decode_fused(z, syn, (h_out, w_out), kp, interpret=True)
    want = xla_out(dec, params, zs, syn, b, h_out, w_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_backward_matches_xla():
    b, h_in, w_in, h_out, w_out = 2, 6, 8, 16, 24
    dec, params, feat, zs, z, syn, kp = setup(b, h_in, w_in, h_out, w_out)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h_out, w_out, 3))

    def loss_fused(z_, kp_):
        out = decode_fused(z_, syn, (h_out, w_out), kp_, interpret=True)
        return jnp.sum(out * g)

    def loss_xla(z_, params_):
        splits = np.cumsum([zz.shape[-1] for zz in zs])[:-1]
        # z_ arrives pre-biased (kernel contract); the hr_step Dense adds
        # bkq itself, so strip the folded copy first
        zs_ = jnp.split(z_ - _kq_bias_vec(kp, 32), splits, axis=-1)
        zs_hr = tuple(grids.upsample_nearest_exact_mm(zz, (h_out, w_out))
                      for zz in zs_)
        syn_b = jnp.broadcast_to(syn[None], (b, h_out, w_out, 3))
        out = dec.apply(params_, zs_hr, syn_b,
                        method=ImplicitDecoder.hr_step)
        return jnp.sum(out * g)

    (dz_f, dkp_f) = jax.grad(loss_fused, argnums=(0, 1))(z, kp)
    (dz_x, dpar_x) = jax.grad(loss_xla, argnums=(0, 1))(z, params)

    np.testing.assert_allclose(np.asarray(dz_f), np.asarray(dz_x),
                               rtol=2e-4, atol=2e-4)
    p = dpar_x["params"]
    n_layers = 3
    np.testing.assert_allclose(np.asarray(dkp_f["w0"]),
                               np.asarray(p["q0"]["dense"]["kernel"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkp_f["b0"]),
                               np.asarray(p["q0"]["dense"]["bias"]),
                               rtol=2e-4, atol=2e-4)
    for i in range(1, n_layers):
        np.testing.assert_allclose(
            np.asarray(dkp_f["wkq"][i - 1]),
            np.asarray(p[f"kq{i}"]["dense"]["kernel"]), rtol=2e-4, atol=2e-4)
        # bkq is unused inside the kernel (pre-folded into z): its
        # direct grad is zero and the true grad appears as the LR-level
        # sum of dz over the layer's channel band
        assert float(np.abs(np.asarray(dkp_f["bkq"][i - 1])).max()) == 0.0
        np.testing.assert_allclose(
            np.asarray(dz_f[..., i * 32:(i + 1) * 32]).sum(axis=(0, 1, 2)),
            np.asarray(p[f"kq{i}"]["dense"]["bias"]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dkp_f["wq"][i - 1]),
            np.asarray(p[f"q{i}"]["dense"]["kernel"]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dkp_f["bq"][i - 1]),
            np.asarray(p[f"q{i}"]["dense"]["bias"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkp_f["wl"]),
                               np.asarray(p["last_dense"]["dense"]["kernel"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkp_f["bl"]),
                               np.asarray(p["last_dense"]["dense"]["bias"]),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Module-level fused eval paths (decode_window / chunked eval / stripe).
# use_fused=True on the CPU backend auto-selects interpreter mode, so these
# exercise the exact module plumbing that runs compiled on TPU.
# ---------------------------------------------------------------------------

def _dec_pair(in_ch=8, hidden=32, n_layers=3):
    kw = dict(in_channels=in_ch, hidden_dims=(hidden,) * n_layers,
              mode=3, init_q=False)
    return (ImplicitDecoder(use_fused=True, **kw),
            ImplicitDecoder(use_fused=False, **kw))


def _feat_params(plain, in_ch=8, h_in=6, w_in=8, size=(16, 24), seed=0):
    key = jax.random.PRNGKey(seed)
    feat = jax.random.normal(key, (2, h_in, w_in, in_ch))
    params = plain.init(key, feat, size)
    return feat, params


@pytest.mark.parametrize("win", [
    (0, 16, 0, 24),      # full grid
    (3, 11, 5, 17),      # interior window
    (0, 16, 18, 24),     # right-edge chunk
])
def test_fused_decode_window_matches_xla(win):
    fused, plain = _dec_pair()
    feat, params = _feat_params(plain)
    args = (feat, (16, 24)) + win
    got = fused.apply(params, *args, method=ImplicitDecoder.decode_window)
    want = plain.apply(params, *args, method=ImplicitDecoder.decode_window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_chunked_eval_matches_plain_full():
    fused, plain = _dec_pair()
    feat, params = _feat_params(plain)
    got = fused.apply(params, feat, (16, 24), 100)   # bsize=100 -> 6-col chunks
    want = plain.apply(params, feat, (16, 24))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_decode_stripe_matches_xla():
    fused, plain = _dec_pair()
    feat, params = _feat_params(plain)
    for start in (0, 5, 20):   # 20 + 8 overhangs W_out=24 -> clamped cols
        got = fused.apply(params, feat, (16, 24), jnp.int32(start), 8,
                          method=ImplicitDecoder.decode_stripe)
        want = plain.apply(params, feat, (16, 24), jnp.int32(start), 8,
                           method=ImplicitDecoder.decode_stripe)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_lr_features_stacked_matches_concat():
    """The fused-path glue (ONE cout=L*hidden conv from concatenated
    kernels) computes exactly concat(lr_features) + the folded kq biases
    — same function, no 75 MB output concat, no HR-level bias pass."""
    fused, plain = _dec_pair()
    feat, params = _feat_params(plain)
    zs = plain.apply(params, feat, method=ImplicitDecoder.lr_features)
    kp = pack_params(params["params"], n_layers=3, dtype=jnp.float32)
    want = jnp.concatenate(list(zs), axis=-1) + _kq_bias_vec(kp, 32)
    got = plain.apply(params, feat,
                      method=ImplicitDecoder.lr_features_stacked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_ok_vmem_boundary():
    """The VMEM size gates of _fused_ok at their exact boundaries."""
    dec = ImplicitDecoder(in_channels=64, hidden_dims=(256,) * 4,
                          use_fused=True)
    # z gate: h_in*w_in * (4*256 ch) * 2 B <= 24 MiB -> 12288 px boundary
    assert dec._fused_ok((110, 110), (16, 128))          # 12100 px
    assert not dec._fused_ok((111, 111), (16, 128))      # 12321 px
    # tile gate: 16 * w_out * (1024 + 6*256) * 4 B <= 48 MiB -> w_out 307
    assert dec._fused_ok((24, 24), (96, 307))
    assert not dec._fused_ok((24, 24), (96, 308))
    # mode gates
    assert not ImplicitDecoder(in_channels=64, mode=2,
                               use_fused=True)._fused_ok((8, 8), (16, 16))
    assert not ImplicitDecoder(in_channels=64, init_q=True,
                               use_fused=True)._fused_ok((8, 8), (16, 16))


# ---------------------------------------------------------------------------
# Integer-ratio fast path (block-repeat gather; the training hot path).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s", [2, 3, 4])
def test_fused_int_forward_matches_xla(s):
    b, h_in, w_in = 2, 6, 8
    h_out, w_out = h_in * s, w_in * s
    dec, params, feat, zs, z, syn, kp = setup(b, h_in, w_in, h_out, w_out)
    got = decode_fused(z, syn, (h_out, w_out), kp, interpret=True)
    want = xla_out(dec, params, zs, syn, b, h_out, w_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s", [2, 3, 4])
def test_fused_int_backward_matches_xla(s):
    b, h_in, w_in = 2, 6, 8
    h_out, w_out = h_in * s, w_in * s
    dec, params, feat, zs, z, syn, kp = setup(b, h_in, w_in, h_out, w_out)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h_out, w_out, 3))

    def loss_fused(z_, kp_):
        out = decode_fused(z_, syn, (h_out, w_out), kp_, interpret=True)
        return jnp.sum(out * g)

    def loss_xla(z_, params_):
        splits = np.cumsum([zz.shape[-1] for zz in zs])[:-1]
        # z_ arrives pre-biased (kernel contract); the hr_step Dense adds
        # bkq itself, so strip the folded copy first
        zs_ = jnp.split(z_ - _kq_bias_vec(kp, 32), splits, axis=-1)
        zs_hr = tuple(grids.upsample_nearest_exact_mm(zz, (h_out, w_out))
                      for zz in zs_)
        syn_b = jnp.broadcast_to(syn[None], (b, h_out, w_out, 3))
        out = dec.apply(params_, zs_hr, syn_b,
                        method=ImplicitDecoder.hr_step)
        return jnp.sum(out * g)

    (dz_f, dkp_f) = jax.grad(loss_fused, argnums=(0, 1))(z, kp)
    (dz_x, dpar_x) = jax.grad(loss_xla, argnums=(0, 1))(z, params)
    np.testing.assert_allclose(np.asarray(dz_f), np.asarray(dz_x),
                               rtol=2e-4, atol=2e-4)
    p = dpar_x["params"]
    np.testing.assert_allclose(np.asarray(dkp_f["w0"]),
                               np.asarray(p["q0"]["dense"]["kernel"]),
                               rtol=2e-4, atol=2e-4)
    for i in range(1, 3):
        np.testing.assert_allclose(
            np.asarray(dkp_f["wkq"][i - 1]),
            np.asarray(p[f"kq{i}"]["dense"]["kernel"]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dkp_f["wq"][i - 1]),
            np.asarray(p[f"q{i}"]["dense"]["kernel"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkp_f["wl"]),
                               np.asarray(p["last_dense"]["dense"]["kernel"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkp_f["bl"]),
                               np.asarray(p["last_dense"]["dense"]["bias"]),
                               rtol=2e-4, atol=2e-4)


def test_pick_tile_h_int():
    from tpu_diinn.kernels.decoder_fused import _pick_tile_h_int
    assert _pick_tile_h_int(96, 2) == 16    # 48px x2
    assert _pick_tile_h_int(144, 3) == 12   # 48px x3 (16 not a multiple of 3)
    assert _pick_tile_h_int(192, 4) == 16   # 48px x4
    assert _pick_tile_h_int(36, 3) == 12
    assert _pick_tile_h_int(20, 20) == 20   # s_h > 16: one LR row per tile


@pytest.mark.parametrize("shape,m_target", [
    ((1, 7, 9, 2), 64),      # LR dims not tile multiples -> pad+slice path
    ((2, 8, 8, 4), 256),     # multi-tile grid in both dimensions
])
def test_fused_int_eval_2d_tiled_matches_xla(shape, m_target):
    """decode_fused_int_eval: per-tile-staged full-image eval kernel
    (round-5: fused decode active on benchmark-sized integer-scale evals)."""
    from tpu_diinn.kernels.decoder_fused import decode_fused_int_eval
    b, h_in, w_in, s = shape
    h_out, w_out = s * h_in, s * w_in
    dec, params, feat, zs, z, syn, kp = setup(b, h_in, w_in, h_out, w_out)
    got = decode_fused_int_eval(z, syn, (h_out, w_out), kp,
                                interpret=True, m_target=m_target)
    want = xla_out(dec, params, zs, syn, b, h_out, w_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decode_window_stages_only_needed_rows():
    """The window fused path must slice z to the window's LR row/col range
    before the kernel (round-4 verdict #4): verify numerics via a window in
    the interior of a larger map."""
    b, h_in, w_in, h_out, w_out = 1, 12, 10, 37, 31
    dec = ImplicitDecoder(in_channels=8, hidden_dims=(32,) * 3, mode=3,
                          init_q=False, use_fused=True)
    key = jax.random.PRNGKey(3)
    feat = jax.random.normal(key, (b, h_in, w_in, 8))
    params = dec.init(key, feat, (h_out, w_out))
    full = dec.apply(params, feat, (h_out, w_out))
    win = dec.apply(params, feat, (h_out, w_out), 11, 30, 7, 26,
                    method=ImplicitDecoder.decode_window)
    np.testing.assert_allclose(np.asarray(win),
                               np.asarray(full[:, 11:30, 7:26]),
                               rtol=2e-5, atol=2e-5)
