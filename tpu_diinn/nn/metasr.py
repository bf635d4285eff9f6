"""MetaSR: meta-upscale baseline (NHWC, flax).

TPU-native redesign of the reference MetaSR (``src/models/components/
metasr.py:23-132``): a hypernetwork MLP(3 -> 256 -> C*9*3) predicts, per HR
query, a (C*9, 3) projection applied to the query's nearest 3x3 unfolded
feature neighborhood.

The per-query projection weights prevent the LR conv factorization used for
DIINN/LIIF, so the 576-channel neighborhoods are gathered at HR — but only
once, inside the (chunked) decode, and the per-query ``bmm`` is a single
batched contraction ``einsum('...c,...co->...o')`` that XLA tiles over the
query grid on the MXU. Index maps are static numpy (separable per axis), so
no grid_sample kernel is required.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from tpu_diinn.core import grids
from tpu_diinn.nn.layers import Dense
from tpu_diinn.nn.diinn import unfold3x3

Array = jnp.ndarray


def _axis_lookup(n_in: int, n_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Indices and scaled rel-coords for one axis (metasr.py:80-101).

    Query coords are shifted by -cell/2 then +1e-6 and clamped before the
    nearest lookup; the looked-up feature coordinate itself carries a -r
    offset (metasr.py:87-88). rel = (shifted_query - shifted_feat) * n_in/2.
    """
    coords = -1.0 + 1.0 / n_out + (2.0 / n_out) * np.arange(n_out)
    cell = 2.0 / n_out
    q = coords - cell / 2.0
    q_clamped = np.clip(q + 1e-6, -1.0 + 1e-6, 1.0 - 1e-6)
    idx = grids.nearest_grid_sample_indices(n_in, q_clamped)
    in_coords = -1.0 + 1.0 / n_in + (2.0 / n_in) * np.arange(n_in)
    feat_c = in_coords[idx] - 1.0 / n_in
    rel = (q - feat_c) * (n_in / 2.0)
    return idx, rel.astype(np.float32)


class MetaSR(nn.Module):
    encoder_spec: str = "rdn"
    feat_dim: int = 64  # encoder out_dim (rdn.py:108-119 -> G0=64)
    hyper_hidden: int = 256
    lane_pack: Optional[bool] = None
    dtype: Any = None

    def setup(self):
        from tpu_diinn.nn.registry import make_encoder
        self.encoder = make_encoder(self.encoder_spec, dtype=self.dtype,
                                    lane_pack=self.lane_pack, name="encoder")
        self.hyper_fc0 = Dense(self.hyper_hidden, dtype=self.dtype,
                               name="hyper_fc0")
        self.hyper_fc1 = Dense(self.feat_dim * 9 * 3, dtype=self.dtype,
                               name="hyper_fc1")

    def decode(self, feat: Array, size: Tuple[int, int],
               bsize: Optional[int] = None) -> Array:
        b, h_in, w_in, c = feat.shape
        assert c == self.feat_dim, (c, self.feat_dim)
        h_out, w_out = size
        unfolded = unfold3x3(feat)  # (B, H_in, W_in, C*9)
        iy, ry = _axis_lookup(h_in, h_out)
        ix_all, rx_all = _axis_lookup(w_in, w_out)
        # r_rev = cell_h * H_in / 2 (metasr.py:99)
        r_rev = np.float32((2.0 / h_out) * h_in / 2.0)

        def decode_cols(col_lo: int, col_hi: int) -> Array:
            return self._pred(unfolded, jnp.asarray(iy), jnp.asarray(ry),
                              jnp.asarray(ix_all[col_lo:col_hi]),
                              jnp.asarray(rx_all[col_lo:col_hi]), r_rev, b,
                              (h_out, col_hi - col_lo))

        if bsize is None:
            return decode_cols(0, w_out)
        chunk = max(1, bsize // h_out)
        outs = [decode_cols(lo, min(lo + chunk, w_out))
                for lo in range(0, w_out, chunk)]
        return jnp.concatenate(outs, axis=2)

    def _pred(self, unfolded: Array, iy, ry, ix, rx, r_rev, b: int,
              shape: Tuple[int, int]) -> Array:
        """Hypernet projection over a column window given (static or traced)
        per-axis index/rel arrays (metasr.py:80-103)."""
        h_c, w_c = shape
        c9 = self.feat_dim * 9
        q_feat = jnp.take(unfolded[:, iy], ix, axis=2)
        inp = jnp.stack(
            [jnp.broadcast_to(ry[:, None], (h_c, w_c)),
             jnp.broadcast_to(rx[None, :], (h_c, w_c)),
             jnp.full((h_c, w_c), r_rev)], axis=-1)
        inp = jnp.broadcast_to(inp[None], (b, h_c, w_c, 3))
        w = self.hyper_fc1(nn.relu(self.hyper_fc0(inp.astype(q_feat.dtype))))
        w = w.reshape(b, h_c, w_c, c9, 3)
        return jnp.einsum("...c,...co->...o", q_feat, w)

    def encode(self, x: Array) -> Array:
        return self.encoder(x)

    def decode_stripe(self, feat: Array, size: Tuple[int, int],
                      col_start: Array, stripe_w: int) -> Array:
        """Stripe decode at a *traced* column offset (clamped; overhang
        repeats the last column) — SPMD unit for query-grid sharding at
        non-divisible widths (parallel/sharding.decode_sharded)."""
        import jax
        b, h_in, w_in, _ = feat.shape
        h_out, w_out = size
        unfolded = unfold3x3(feat)
        iy, ry = _axis_lookup(h_in, h_out)
        ix_all, rx_all = _axis_lookup(w_in, w_out)
        r_rev = np.float32((2.0 / h_out) * h_in / 2.0)
        pad = stripe_w
        ix_p = jnp.asarray(np.concatenate(
            [ix_all, np.full(pad, ix_all[-1], ix_all.dtype)]))
        rx_p = jnp.asarray(np.concatenate(
            [rx_all, np.full(pad, rx_all[-1], rx_all.dtype)]))
        ix = jax.lax.dynamic_slice(ix_p, (col_start,), (stripe_w,))
        rx = jax.lax.dynamic_slice(rx_p, (col_start,), (stripe_w,))
        return self._pred(unfolded, jnp.asarray(iy), jnp.asarray(ry), ix, rx,
                          r_rev, b, (h_out, stripe_w))

    def decode_traced(self, feat: Array, iy, ry, ix, rx, r_rev,
                      out_hw: Tuple[int, int],
                      bsize: Optional[int] = None) -> Array:
        """Decode with externally-supplied (possibly traced) per-axis
        index/rel arrays and r_rev scalar — the bucketed static-shape eval
        unit (train/bucketed.py). Row-band chunked via ``bsize``."""
        b = feat.shape[0]
        h_out, w_out = out_hw
        unfolded = unfold3x3(feat)
        band = h_out if bsize is None else max(1, bsize // max(w_out, 1))
        outs = [self._pred(unfolded, iy[lo:min(lo + band, h_out)],
                           ry[lo:min(lo + band, h_out)], ix, rx, r_rev, b,
                           (min(lo + band, h_out) - lo, w_out))
                for lo in range(0, h_out, band)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    def __call__(self, x: Array, size: Tuple[int, int],
                 bsize: Optional[int] = None) -> Array:
        return self.decode(self.encoder(x), size, bsize)
