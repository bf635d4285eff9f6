"""EDSR encoder (NHWC, flax).

Re-implementation of the reference EDSR (``src/models/components/edsr.py:5-47``):
MeanShift -> head conv -> 16 ResBlocks + conv with global residual ->
PixelShuffle tail -> MeanShift. ``EDSRBaseline`` drops the tail/mean-shift and
returns the feature grid — the encoder variant paired with the DIINN decoder
in the "tiny DIINN" baseline config (BASELINE.json configs[0]).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpu_diinn.nn.layers import Conv, MeanShift, ResBlock, Upsampler

Array = jnp.ndarray


class EDSRBaseline(nn.Module):
    """Headless EDSR: conv head + residual body, returns (B, H, W, n_feats)."""
    n_resblocks: int = 16
    n_feats: int = 64
    halo_axis: Any = None
    lane_pack: bool = False
    dtype: Any = None

    @property
    def out_dim(self) -> int:
        return self.n_feats

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv(self.n_feats, 3, halo_axis=self.halo_axis,
                 lane_pack=self.lane_pack, dtype=self.dtype, name="head")(x)
        r = y
        for i in range(self.n_resblocks):
            r = ResBlock(self.n_feats, 3, halo_axis=self.halo_axis,
                         lane_pack=self.lane_pack,
                         dtype=self.dtype, name=f"res{i}")(r)
        r = Conv(self.n_feats, 3, halo_axis=self.halo_axis,
                 lane_pack=self.lane_pack, dtype=self.dtype,
                 name="body_tail")(r)
        return y + r


class EDSR(nn.Module):
    """Full EDSR super-resolver at a fixed integer scale."""
    n_resblocks: int = 16
    n_feats: int = 64
    scale: int = 4
    rgb_range: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, size=None) -> Array:
        x = MeanShift(self.rgb_range, sign=-1, name="sub_mean")(x)
        y = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        r = y
        for i in range(self.n_resblocks):
            r = ResBlock(self.n_feats, 3, dtype=self.dtype, name=f"res{i}")(r)
        r = Conv(self.n_feats, 3, dtype=self.dtype, name="body_tail")(r)
        y = y + r
        y = Upsampler(self.scale, self.n_feats, dtype=self.dtype,
                      name="upsampler")(y)
        y = Conv(3, 3, dtype=self.dtype, name="tail")(y)
        return MeanShift(self.rgb_range, sign=1, name="add_mean")(y)
