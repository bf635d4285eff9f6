"""FLOP accounting (train/flops.py) cross-checked against actual params.

For stacks of convs/denses evaluated at one resolution, MACs per pixel ==
total kernel weights (biases excluded). So the analytic per-pixel MAC
counts must equal the summed kernel sizes of the real initialized models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diinn.train import flops as F


def _kernel_weights(params) -> int:
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if any(getattr(k, "key", None) == "kernel" for k in path):
            total += int(np.prod(leaf.shape))
    return total


def test_rdn_macs_match_param_count():
    from tpu_diinn.nn.registry import make_encoder
    enc = make_encoder("rdn")
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert F.rdn_macs_per_px() == _kernel_weights(params)


def test_edsr_baseline_macs_match_param_count():
    from tpu_diinn.nn.registry import make_encoder
    enc = make_encoder("edsr-baseline")
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert F.edsr_baseline_macs_per_px() == _kernel_weights(params)


def test_decoder_macs_match_param_count():
    from tpu_diinn.nn.diinn import ImplicitDecoder
    dec = ImplicitDecoder(in_channels=64)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)),
                      (16, 16))
    expect = (F.decoder_lr_macs_per_px(64) +
              F.decoder_hr_macs_per_query())
    assert expect == _kernel_weights(params)


def test_train_step_flops_breakdown():
    out = F.train_step_flops(batch=8, patch=48, scales=[4])
    # encoder: 2 * 21.96M MACs/px * 8*48*48 px * 3 (fwd+bwd)
    assert out["encoder"] == pytest.approx(
        2 * F.rdn_macs_per_px() * 8 * 48 * 48 * 3)
    assert out["decoder_hr"] == pytest.approx(
        2 * F.decoder_hr_macs_per_query() * 8 * 192 * 192 * 3)
    assert out["total"] == pytest.approx(
        out["encoder"] + out["decoder_lr"] + out["decoder_hr"])
    assert 0.0 < F.mfu(out["total"], 1.0) < 1.0
