"""Residual Dense Network encoder (NHWC, flax).

TPU-native re-implementation of the reference RDN feature extractor
(``src/models/components/rdn.py:5-119``): shallow feature extraction (2
convs), D residual dense blocks of C concat-growing convs + 1x1 local fusion,
global fusion over the concatenated block outputs, residual to the first
shallow feature. With ``upsampling=None`` (the DIINN/LIIF/MetaSR use,
``rdn.py:68-69,102-103``) it returns a (B, H, W, G0) feature grid at input
resolution; the optional PixelShuffle head (``rdn.py:72-88``) is kept for
surface parity.

All convs are 3x3/1x1 stride-1 — XLA maps them straight onto the MXU; channel
concats are free (fused into the following conv's input).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tpu_diinn.nn.layers import Conv, pixel_shuffle

Array = jnp.ndarray

RDN_CONFIGS = {
    # name: (D blocks, C convs/block, G growth)
    "A": (20, 6, 32),
    "B": (16, 8, 64),
}


class RDB(nn.Module):
    """Residual dense block: C concat-growing convs + 1x1 fusion + residual."""
    growth0: int
    growth: int
    n_convs: int
    halo_axis: Any = None
    lane_pack: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        for c in range(self.n_convs):
            out = nn.relu(Conv(self.growth, 3, halo_axis=self.halo_axis,
                               lane_pack=self.lane_pack,
                               dtype=self.dtype, name=f"conv{c}")(y))
            y = jnp.concatenate([y, out], axis=-1)
        y = Conv(self.growth0, 1, dtype=self.dtype, name="lff")(y)
        return x + y


class RDN(nn.Module):
    growth0: int = 64
    config: str = "B"
    n_colors: int = 3
    upsampling: Optional[int] = None  # None => return feature grid (out_dim=G0)
    halo_axis: Any = None
    # lane_pack: compute the G0/G-channel 3x3 convs in the column-pair packed
    # form for full MXU lane use (layers._LanePackedConv3x3; same params).
    lane_pack: bool = False
    dtype: Any = None

    @property
    def out_dim(self) -> int:
        return self.n_colors if self.upsampling else self.growth0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d, c, g = RDN_CONFIGS[self.config]
        g0 = self.growth0
        lp = self.lane_pack
        f1 = Conv(g0, 3, halo_axis=self.halo_axis, lane_pack=lp,
                  dtype=self.dtype, name="sfe1")(x)
        y = Conv(g0, 3, halo_axis=self.halo_axis, lane_pack=lp,
                 dtype=self.dtype, name="sfe2")(f1)
        block_outs = []
        for i in range(d):
            y = RDB(g0, g, c, halo_axis=self.halo_axis, lane_pack=lp,
                    dtype=self.dtype, name=f"rdb{i}")(y)
            block_outs.append(y)
        y = Conv(g0, 1, dtype=self.dtype, name="gff1")(
            jnp.concatenate(block_outs, axis=-1))
        y = Conv(g0, 3, halo_axis=self.halo_axis, lane_pack=lp,
                 dtype=self.dtype, name="gff2")(y)
        y = y + f1
        if not self.upsampling:
            return y
        r = self.upsampling
        if r in (2, 3):
            y = Conv(g * r * r, 3, dtype=self.dtype, name="up0")(y)
            y = pixel_shuffle(y, r)
            y = Conv(self.n_colors, 3, dtype=self.dtype, name="up1")(y)
        elif r == 4:
            y = Conv(g * 4, 3, dtype=self.dtype, name="up0")(y)
            y = pixel_shuffle(y, 2)
            y = Conv(g * 4, 3, dtype=self.dtype, name="up1")(y)
            y = pixel_shuffle(y, 2)
            y = Conv(self.n_colors, 3, dtype=self.dtype, name="up2")(y)
        else:
            raise ValueError("upsampling scale must be 2, 3 or 4")
        return y


class RDNSmall(RDN):
    """Reduced RDN for tests/CI: same wiring, tiny dims."""
    growth0: int = 16
    config: str = "tiny"


RDN_CONFIGS["tiny"] = (2, 2, 16)


def make_rdn(*, growth0: int = 64, config: str = "B", dtype=None) -> RDN:
    """Default feature-extractor configuration used by all three models
    (reference ``rdn.py:108-119``: G0=64, config 'B', no upsampling)."""
    return RDN(growth0=growth0, config=config, upsampling=None, dtype=dtype)
