"""Parity tests: JAX separable bicubic resize vs torch antialiased bicubic.

torch F.interpolate(mode='bicubic', antialias=True) is exactly what the
reference's torchvision transforms.Resize dispatches to on tensors
(reference srdata.py:163-166, sr_module.py:16-19), so it is the oracle.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from tpu_diinn.core import resize


CASES = [
    ((48, 48), (96, 96)),      # x2 up
    ((96, 96), (48, 48)),      # x2 down
    ((151, 97), (48, 48)),     # non-integer down (patch pipeline)
    ((48, 48), (151, 151)),    # non-integer up (x3.14-ish)
    ((100, 80), (32, 25)),     # asymmetric down
    ((17, 23), (34, 46)),      # small
    ((7, 9), (7, 9)),          # identity size
]


@pytest.mark.parametrize("in_size,out_size", CASES)
def test_torch_kernel_matches_torch_antialias_bicubic(in_size, out_size):
    rng = np.random.default_rng(42)
    x = rng.random((2, *in_size, 3), dtype=np.float64).astype(np.float32)
    got = np.asarray(resize.resize(jnp.asarray(x), out_size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).double()
    want = F.interpolate(xt, size=out_size, mode="bicubic", antialias=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_matrix_rows_sum_to_one():
    for (n_in, n_out) in [(48, 97), (97, 48), (5, 13), (13, 5)]:
        for k in ("torch", "matlab"):
            m = resize.resize_matrix(n_in, n_out, kernel=k)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


def test_matlab_kernel_matches_matlab_imresize_golden():
    """Golden fixtures generated from the reference's pure-numpy MATLAB
    imresize oracle (scripts/gen_golden_resize.py)."""
    import pathlib
    data = np.load(pathlib.Path(__file__).parent / "golden" /
                   "matlab_resize.npz")
    for name in ("down2", "down_pi", "up2", "up_noninteger"):
        x = data[f"{name}_in"]
        want = data[f"{name}_out"]
        got = np.asarray(resize.resize(jnp.asarray(x), want.shape[:2],
                                       kernel="matlab"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5,
                                   err_msg=name)


def test_gradients_flow_through_resize():
    import jax
    x = jnp.ones((1, 12, 12, 3))
    g = jax.grad(lambda im: resize.resize(im, (5, 5)).sum())(x)
    # resize preserves total mass for constant images: grad is the column sums
    # of the weight matrices, all finite and ~ (5*5)/(12*12) on average.
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g).sum(), 5 * 5 * 3, rtol=1e-4)


def test_resize_by_scale_size_rounding():
    assert resize.resize_by_scale_size((100, 100), 3.0) == (33, 33)
    assert resize.resize_by_scale_size((157, 100), 3.14) == (50, 32)
