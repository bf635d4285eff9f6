"""Golden tests for coordinate/index math vs PyTorch semantics.

torch (CPU) is used as the oracle for `nearest-exact` interpolation and
pixel-center grid conventions that the reference relies on
(reference diinn.py:94-110, liif.py:32-46).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from tpu_diinn.core import grids


@pytest.mark.parametrize("n", [1, 2, 3, 5, 48, 97])
def test_pixel_center_coords_matches_reference_formula(n):
    got = np.asarray(grids.pixel_center_coords(n))
    want = -1 + 1 / n + 2 / n * np.arange(n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n_in,n_out", [
    (5, 13), (48, 96), (48, 151), (7, 22), (10, 10), (13, 5), (100, 314),
    (1, 4), (3, 7),
])
def test_nearest_exact_indices_match_torch(n_in, n_out):
    x = torch.arange(n_in, dtype=torch.float32).view(1, 1, n_in, 1)
    y = F.interpolate(x, size=(n_out, 1), mode="nearest-exact")
    want = y.flatten().numpy().astype(np.int32)
    got = grids.nearest_exact_indices(n_in, n_out)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("in_size,out_size", [
    ((5, 7), (13, 11)), ((48, 48), (96, 151)), ((20, 30), (63, 94)),
])
def test_upsample_nearest_exact_matches_torch(in_size, out_size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    got = np.asarray(grids.upsample_nearest_exact(jnp.asarray(x), out_size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_size, mode="nearest-exact")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("in_size,out_size", [
    ((5, 7), (13, 11)), ((48, 48), (96, 151)), ((48, 48), (150, 150)),
])
def test_rel_coord_grid_matches_torch_reference_math(in_size, out_size):
    """Reproduce reference _make_pos_encoding (diinn.py:94-110) in torch."""
    H, W = in_size
    H_up, W_up = out_size
    h_idx = -1 + 1 / H + 2 / H * torch.arange(H).float()
    w_idx = -1 + 1 / W + 2 / W * torch.arange(W).float()
    in_grid = torch.stack(torch.meshgrid(h_idx, w_idx, indexing="ij"), dim=0)
    h_up = -1 + 1 / H_up + 2 / H_up * torch.arange(H_up).float()
    w_up = -1 + 1 / W_up + 2 / W_up * torch.arange(W_up).float()
    up_grid = torch.stack(torch.meshgrid(h_up, w_up, indexing="ij"), dim=0)
    rel = up_grid - F.interpolate(in_grid.unsqueeze(0), size=(H_up, W_up),
                                  mode="nearest-exact")[0]
    rel[0] *= H
    rel[1] *= W
    want = rel.permute(1, 2, 0).numpy()

    got = np.asarray(grids.rel_coord_grid(in_size, out_size))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_syn_input_grid_ratio_channel():
    syn = np.asarray(grids.syn_input_grid((10, 20), (25, 50)))
    assert syn.shape == (25, 50, 3)
    np.testing.assert_allclose(syn[..., 2], (10 * 20) / (25 * 50), rtol=1e-6)


@pytest.mark.parametrize("n_in", [5, 48, 100])
def test_nearest_grid_sample_indices_match_torch(n_in):
    coords = np.linspace(-1.3, 1.3, 277)
    got = grids.nearest_grid_sample_indices(n_in, np.clip(coords, -1 + 1e-6,
                                                          1 - 1e-6))
    feat = torch.arange(n_in, dtype=torch.float32).view(1, 1, 1, n_in)
    grid = torch.zeros(1, 1, coords.size, 2)
    grid[0, 0, :, 0] = torch.from_numpy(np.clip(coords, -1 + 1e-6, 1 - 1e-6))
    want = F.grid_sample(feat, grid, mode="nearest", align_corners=False)
    want = want.flatten().numpy().astype(np.int32)
    np.testing.assert_array_equal(got, want)
