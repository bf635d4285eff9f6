"""LIIF: Local Implicit Image Function baseline (NHWC, flax).

TPU-native redesign of the reference LIIF (``src/models/components/liif.py:
9-155``): 4-corner local ensemble over nearest feature lookups, 3x3 feature
unfolding, cell decoding, and an MLP image function, with the diagonal
area-swap blend (``liif.py:120-127``).

TPU-first choices:
- All corner lookups are ``grid_sample(mode='nearest', align_corners=False)``
  over coordinates that are pure functions of the two image sizes, so the
  index maps are computed in numpy at trace time and become static gathers —
  no grid_sample kernel needed, and the per-axis separability collapses the
  2-D lookup into two 1-D index arrays.
- The imnet's first layer contracting the 576 unfolded-feature channels is
  algebraically a 3x3 conv on the LR feature grid; it runs once at LR
  resolution and is gathered per corner (same factorization as the DIINN
  decoder — see nn/diinn.py). Only the 256-wide layers run per HR query.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from tpu_diinn.core import grids
from tpu_diinn.nn.layers import Conv, Dense

Array = jnp.ndarray

_EPS_SHIFT = 1e-6
_CLAMP = 1.0 - 1e-6


def _corner_axis_indices(n_in: int, n_out: int, v: int,
                         local: bool) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-lookup indices and rel-coords for one axis and corner offset v.

    Follows reference liif.py:85-104: shift the query coordinate by
    v * (1/n_in) + eps, clamp to +-(1 - 1e-6), nearest-lookup, and return
    (indices, rel_coord * n_in).
    """
    coords = -1.0 + 1.0 / n_out + (2.0 / n_out) * np.arange(n_out)
    r = 1.0 / n_in
    shifted = coords + (v * r + (_EPS_SHIFT if local else 0.0))
    shifted = np.clip(shifted, -_CLAMP, _CLAMP)
    idx = grids.nearest_grid_sample_indices(n_in, shifted)
    in_coords = -1.0 + 1.0 / n_in + (2.0 / n_in) * np.arange(n_in)
    rel = (coords - in_coords[idx]) * n_in
    return idx, rel.astype(np.float32)


class LIIF(nn.Module):
    local_ensemble: bool = True
    feat_unfold: bool = True
    cell_decode: bool = True
    encoder_spec: str = "rdn"
    hidden: Sequence[int] = (256, 256, 256, 256)
    lane_pack: Optional[bool] = None
    dtype: Any = None

    def setup(self):
        from tpu_diinn.nn.registry import make_encoder
        self.encoder = make_encoder(self.encoder_spec, dtype=self.dtype,
                                    lane_pack=self.lane_pack, name="encoder")
        # imnet layer 0, factorized: unfolded-feature part as a 3x3 (or 1x1)
        # conv at LR; rel-coord and cell parts as tiny per-query denses.
        k = 3 if self.feat_unfold else 1
        self.imnet_feat = Conv(self.hidden[0], k, use_bias=False,
                               dtype=self.dtype, name="imnet_feat")
        self.imnet_rel = Dense(self.hidden[0], dtype=self.dtype,
                               name="imnet_rel")
        if self.cell_decode:
            self.imnet_cell = Dense(self.hidden[0], use_bias=False,
                                    dtype=self.dtype, name="imnet_cell")
        self.imnet_tail = [Dense(h, dtype=self.dtype, name=f"imnet_fc{i + 1}")
                           for i, h in enumerate(self.hidden[1:])]
        self.imnet_out = Dense(3, dtype=self.dtype,
                               name=f"imnet_fc{len(self.hidden)}")

    def decode(self, feat: Array, size: Tuple[int, int],
               bsize: Optional[int] = None) -> Array:
        """Implicit decode of an LR feature grid to ``size``
        (reference ``query_rgb``, liif.py:59-127)."""
        b, h_in, w_in, _ = feat.shape
        h_out, w_out = size
        z = self.imnet_feat(feat)

        if self.local_ensemble:
            corners = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        else:
            corners = [(0, 0)]
        cell = np.asarray([2.0 * h_in / h_out, 2.0 * w_in / w_out],
                          dtype=np.float32)  # rel_cell (liif.py:107-110)

        def decode_cols(col_lo: int, col_hi: int) -> Array:
            per_corner = []
            for (vy, vx) in corners:
                iy, ry = _corner_axis_indices(h_in, h_out, vy,
                                              self.local_ensemble)
                ix, rx = _corner_axis_indices(w_in, w_out, vx,
                                              self.local_ensemble)
                per_corner.append((jnp.asarray(iy), jnp.asarray(ry),
                                   jnp.asarray(ix[col_lo:col_hi]),
                                   jnp.asarray(rx[col_lo:col_hi])))
            return self._blend(z, per_corner, cell, b,
                               (h_out, col_hi - col_lo))

        if bsize is None:
            return decode_cols(0, w_out)
        chunk = max(1, bsize // h_out)
        outs = [decode_cols(lo, min(lo + chunk, w_out))
                for lo in range(0, w_out, chunk)]
        return jnp.concatenate(outs, axis=2)

    def _blend(self, z: Array, per_corner, cell, b: int,
               shape: Tuple[int, int]) -> Array:
        """Corner predictions + diagonal-area-swap blend (liif.py:94-127)
        from per-corner (row_idx, row_rel, col_idx, col_rel) arrays — static
        or traced, so both chunked eval and stripe sharding reuse it."""
        h_c, w_c = shape
        preds, areas = [], []
        for iy, ry, ix, rx in per_corner:
            q = jnp.take(z[:, iy], ix, axis=2)
            rel = jnp.broadcast_to(
                jnp.stack(
                    [jnp.broadcast_to(ry[:, None], (h_c, w_c)),
                     jnp.broadcast_to(rx[None, :], (h_c, w_c))],
                    axis=-1)[None],
                (b, h_c, w_c, 2)).astype(q.dtype)
            y = q + self.imnet_rel(rel)
            if self.cell_decode:
                y = y + self.imnet_cell(jnp.broadcast_to(
                    jnp.asarray(cell), (b, h_c, w_c, 2)).astype(q.dtype))
            y = nn.relu(y)
            for d in self.imnet_tail:
                y = nn.relu(d(y))
            preds.append(self.imnet_out(y))
            areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)
        if self.local_ensemble:
            # diagonal area swap (liif.py:120-127)
            areas = [areas[3], areas[2], areas[1], areas[0]]
        tot = sum(areas)
        return sum(p * (a / tot)[..., None] for p, a in zip(preds, areas))

    def encode(self, x: Array) -> Array:
        return self.encoder(x)

    def decode_stripe(self, feat: Array, size: Tuple[int, int],
                      col_start: Array, stripe_w: int) -> Array:
        """Decode a ``stripe_w``-wide column stripe at *traced* offset
        ``col_start`` (clamped; overhang repeats the last column) — the SPMD
        unit for query-grid sharding at non-divisible widths
        (parallel/sharding.decode_sharded)."""
        import jax
        b, h_in, w_in, _ = feat.shape
        h_out, w_out = size
        z = self.imnet_feat(feat)
        corners = [(-1, -1), (-1, 1), (1, -1), (1, 1)] \
            if self.local_ensemble else [(0, 0)]
        cell = np.asarray([2.0 * h_in / h_out, 2.0 * w_in / w_out],
                          dtype=np.float32)
        pad = stripe_w
        per_corner = []
        for (vy, vx) in corners:
            iy, ry = _corner_axis_indices(h_in, h_out, vy,
                                          self.local_ensemble)
            ix, rx = _corner_axis_indices(w_in, w_out, vx,
                                          self.local_ensemble)
            ix_p = jnp.asarray(np.concatenate(
                [ix, np.full(pad, ix[-1], ix.dtype)]))
            rx_p = jnp.asarray(np.concatenate(
                [rx, np.full(pad, rx[-1], rx.dtype)]))
            per_corner.append(
                (jnp.asarray(iy), jnp.asarray(ry),
                 jax.lax.dynamic_slice(ix_p, (col_start,), (stripe_w,)),
                 jax.lax.dynamic_slice(rx_p, (col_start,), (stripe_w,))))
        return self._blend(z, per_corner, cell, b, (h_out, stripe_w))

    def decode_traced(self, feat: Array, per_corner, cell: Array,
                      out_hw: Tuple[int, int],
                      bsize: Optional[int] = None) -> Array:
        """Decode with externally-supplied (possibly traced) per-corner
        index/rel arrays and cell — the unit of bucketed static-shape eval
        (train/bucketed.py): the compiled program depends only on the
        padded ``out_hw``, so differently-sized images share one program.
        ``per_corner`` is a sequence of (row_idx, row_rel, col_idx,
        col_rel); ``cell`` a (2,) array. Row-band chunked via ``bsize``."""
        b = feat.shape[0]
        h_out, w_out = out_hw
        z = self.imnet_feat(feat)
        band = h_out if bsize is None else max(1, bsize // max(w_out, 1))
        outs = []
        for lo in range(0, h_out, band):
            hi = min(lo + band, h_out)
            pc = [(iy[lo:hi], ry[lo:hi], ix, rx)
                  for iy, ry, ix, rx in per_corner]
            outs.append(self._blend(z, pc, cell, b, (hi - lo, w_out)))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    def __call__(self, x: Array, size: Tuple[int, int],
                 bsize: Optional[int] = None) -> Array:
        return self.decode(self.encoder(x), size, bsize)
