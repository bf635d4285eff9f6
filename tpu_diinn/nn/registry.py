"""Model/encoder registry — the ``make_net`` equivalent
(reference ``sr_module.py:42-50``).

All models share the contract ``net.apply(params, x_lr, size, bsize) -> sr``
with NHWC tensors; ``bsize`` bounds eval-time decode memory via serial column
chunking (reference ``diinn.py:149-160``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from tpu_diinn.nn.rdn import RDN
from tpu_diinn.nn.edsr import EDSRBaseline


ENCODERS = {
    # spec: (class, kwargs)
    "rdn": (RDN, dict(growth0=64, config="B")),
    "rdn-tiny": (RDN, dict(growth0=16, config="tiny")),
    "edsr-baseline": (EDSRBaseline, dict(n_resblocks=16, n_feats=64)),
    "edsr-baseline-tiny": (EDSRBaseline, dict(n_resblocks=2, n_feats=16)),
}


def make_encoder(spec: str, *, dtype=None, name: Optional[str] = None,
                 halo_axis=None,
                 lane_pack: Optional[bool] = None) -> nn.Module:
    if lane_pack is None:
        # auto = off: the column-pair packed form was measured 12% SLOWER
        # end-to-end on v5e (scripts/lane_ab.py, PERF.md "lane packing") —
        # XLA's conv emitter already handles cout=64 well there. Kept as an
        # opt-in knob (model.lane_pack=true) for other TPU generations.
        lane_pack = False
    cls, kwargs = ENCODERS[spec]
    return cls(dtype=dtype, name=name, halo_axis=halo_axis,
               lane_pack=lane_pack, **kwargs)


def encoder_out_dim(spec: str) -> int:
    cls, kwargs = ENCODERS[spec]
    if cls is RDN:
        return kwargs["growth0"]
    if cls is EDSRBaseline:
        return kwargs["n_feats"]
    raise ValueError(spec)


def make_net(arch: str, *, mode: int = 3, init_q: bool = False,
             encoder_spec: str = "rdn", dtype: Any = None,
             hidden_dims=None, use_fused: Optional[bool] = None,
             lane_pack: Optional[bool] = None) -> nn.Module:
    from tpu_diinn.nn.diinn import DIINN
    from tpu_diinn.nn.liif import LIIF
    from tpu_diinn.nn.metasr import MetaSR
    from tpu_diinn.nn.bicubic import BicubicNet
    if arch == "diinn":
        kw = dict(mode=mode, init_q=init_q, encoder_spec=encoder_spec,
                  dtype=dtype, use_fused=use_fused, lane_pack=lane_pack)
        if hidden_dims is not None:
            kw["hidden_dims"] = tuple(hidden_dims)
        return DIINN(**kw)
    if arch == "liif":
        kw = dict(encoder_spec=encoder_spec, dtype=dtype,
                  lane_pack=lane_pack)
        if hidden_dims is not None:
            kw["hidden"] = tuple(hidden_dims)
        return LIIF(**kw)
    if arch == "metasr":
        return MetaSR(encoder_spec=encoder_spec,
                      feat_dim=encoder_out_dim(encoder_spec), dtype=dtype,
                      lane_pack=lane_pack)
    if arch == "bicubic":
        return BicubicNet(dtype=dtype)
    raise ValueError(f"unknown arch: {arch!r}")
