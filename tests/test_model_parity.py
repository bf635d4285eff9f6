"""Bit-parity tests vs golden fixtures generated from the PyTorch reference.

Fixtures (tests/golden/*.npz, from scripts/gen_golden_models.py) store the
reference state_dict names/shapes + deterministic-seeded weights
(parity_utils.fill_values), inputs, outputs, and input-gradients. Each test
rebuilds the same weights, converts them with tpu_diinn.compat.torch_loader,
runs the tpu_diinn model, and asserts forward AND backward allclose.
"""

import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_diinn.compat import torch_loader as tl
from tpu_diinn.nn.diinn import DIINN, ImplicitDecoder
from tpu_diinn.nn.edsr import EDSRBaseline
from tpu_diinn.nn.liif import LIIF
from tpu_diinn.nn.metasr import MetaSR

from tests.parity_utils import fill_values

GOLDEN = pathlib.Path(__file__).parent / "golden"


def load_fixture(tag):
    d = np.load(GOLDEN / f"{tag}.npz", allow_pickle=False)
    names = [str(n) for n in d["names"]]
    shapes = [tuple(int(v) for v in s.split(",")) for s in d["shapes"]]
    sd = fill_values(names, shapes, int(d["seed"]))
    return sd, d


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def check_fwd_bwd(apply_fn, params, d, rtol=2e-4, atol=3e-5,
                  grad_atol=None):
    x = jnp.asarray(nchw_to_nhwc(d["x"]))
    g = jnp.asarray(nchw_to_nhwc(d["g"]))
    want_y = nchw_to_nhwc(d["y"])
    want_xg = nchw_to_nhwc(d["x_grad"])

    def loss(xx):
        return (apply_fn(params, xx) * g).sum()

    y = apply_fn(params, x)
    scale_y = max(1e-3, float(np.abs(want_y).max()))
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=rtol,
                               atol=atol * scale_y)
    xg = jax.grad(loss)(x)
    scale_g = max(1e-3, float(np.abs(want_xg).max()))
    np.testing.assert_allclose(np.asarray(xg), want_xg, rtol=rtol,
                               atol=(grad_atol or atol) * scale_g)


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
@pytest.mark.parametrize("init_q", [False, True])
def test_decoder_parity(mode, init_q):
    sd, d = load_fixture(f"diinn_dec_m{mode}_q{int(init_q)}")
    dec = ImplicitDecoder(in_channels=16, hidden_dims=(32, 32, 32),
                          mode=mode, init_q=init_q)
    tree = tl.convert_diinn_decoder(sd, "", in_channels=16, n_layers=3,
                                    hidden=32, mode=mode, init_q=init_q)
    params = {"params": tree}
    size = tuple(int(v) for v in d["size"])
    check_fwd_bwd(lambda p, x: dec.apply(p, x, size), params, d)


def test_decoder_chunked_eval_matches_full():
    sd, d = load_fixture("diinn_dec_m3_q0")
    dec = ImplicitDecoder(in_channels=16, hidden_dims=(32, 32, 32), mode=3)
    params = {"params": tl.convert_diinn_decoder(
        sd, "", in_channels=16, n_layers=3, hidden=32, mode=3)}
    x = jnp.asarray(nchw_to_nhwc(d["x"]))
    size = tuple(int(v) for v in d["size"])
    full = dec.apply(params, x, size)
    chunked = dec.apply(params, x, size, 60)  # bsize=60 -> 3-col chunks
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_diinn_full_flagship_parity():
    """Full RDN-B + mode-3 decoder at a non-integer scale, fwd + bwd."""
    sd, d = load_fixture("diinn_full_m3")
    net = DIINN(mode=3, init_q=False)
    params = tl.convert_diinn(sd, mode=3, init_q=False)
    size = tuple(int(v) for v in d["size"])
    check_fwd_bwd(lambda p, x: net.apply(p, x, size), params, d,
                  rtol=5e-4, atol=1e-4)


def test_liif_full_parity():
    sd, d = load_fixture("liif_full")
    net = LIIF()
    params = tl.convert_liif(sd)
    size = tuple(int(v) for v in d["size"])
    # fwd matches to ~5e-6. The input-grad through RDN-B is fp32
    # ill-conditioned: torch-fp32 itself deviates ~1.1e-3 (of max-grad) from
    # the fp64 truth on this fixture, so the tolerance reflects conditioning,
    # not implementation slack. Decoder-path grads are tested tightly in
    # test_liif_decode_parity.
    check_fwd_bwd(lambda p, x: net.apply(p, x, size), params, d,
                  rtol=5e-4, atol=1e-4, grad_atol=2e-3)


def test_metasr_full_parity():
    sd, d = load_fixture("metasr_full")
    net = MetaSR()
    params = tl.convert_metasr(sd)
    size = tuple(int(v) for v in d["size"])
    check_fwd_bwd(lambda p, x: net.apply(p, x, size), params, d,
                  rtol=5e-4, atol=1e-4)


def test_liif_decode_parity():
    """Decoder path alone (grads wrt the 64-ch feature grid): tight tolerance."""
    sd, d = load_fixture("liif_decode")
    net = LIIF()
    params = tl.convert_liif(sd)
    size = tuple(int(v) for v in d["size"])
    check_fwd_bwd(lambda p, x: net.apply(p, x, size, method=LIIF.decode),
                  params, d)


def test_metasr_decode_parity():
    sd, d = load_fixture("metasr_decode")
    net = MetaSR()
    params = tl.convert_metasr(sd)
    size = tuple(int(v) for v in d["size"])
    check_fwd_bwd(lambda p, x: net.apply(p, x, size, method=MetaSR.decode),
                  params, d)


def test_edsr_baseline_parity():
    sd, d = load_fixture("edsr_baseline")
    net = EDSRBaseline(n_resblocks=4, n_feats=24)
    params = tl.convert_edsr_baseline(sd, n_resblocks=4)
    check_fwd_bwd(lambda p, x: net.apply(p, x), params, d)
