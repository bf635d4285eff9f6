"""SRTask: normalization, multi-scale L1 loss, and metric computation.

Functional equivalent of the reference ``SRLitModule`` (``src/models/
sr_module.py:62-195``) minus the framework plumbing: it owns the [-1, 1]
input normalization (``sr_module.py:96-97,119-120``), the L1 loss averaged
over the scales present in a batch (``sr_module.py:113-125``), and the
denormalize+clamp applied to predictions.

The reference's demo scripts call the raw net and silently skip
normalization (``demo2.py:40`` vs ``sr_module.py:119-123``); ``predict``
here always normalizes internally, fixing that quirk.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


@functools.lru_cache(maxsize=8)
def _enc_dec_for(net):
    """(encoder, decoder) submodules matching a DIINN net's param tree —
    the decomposed form used by the shared-LR multi-scale fast path (and
    mirrored by train/streaming.py, train/bucketed.py)."""
    from tpu_diinn.nn.diinn import ImplicitDecoder
    from tpu_diinn.nn.registry import make_encoder
    enc = make_encoder(net.encoder_spec, dtype=net.dtype,
                       lane_pack=net.lane_pack)
    dec = ImplicitDecoder(in_channels=enc.out_dim,
                          hidden_dims=net.hidden_dims, mode=net.mode,
                          init_q=net.init_q, exact_sin=net.exact_sin,
                          use_fused=net.use_fused, dtype=net.dtype)
    return enc, dec

SUB = 0.5
DIV = 0.5


def normalize(x: Array) -> Array:
    return (x - SUB) / DIV


def denormalize(x: Array) -> Array:
    return x * DIV + SUB


@dataclasses.dataclass(frozen=True)
class SRTask:
    """Binds a model to the training objective."""
    net: nn.Module
    eval_bsize: int = 30000

    def loss_and_preds(self, params, batch: Dict[Any, Tuple[Array, Array]],
                       bsize: Optional[int] = None, constrain=None):
        """Multi-scale step (reference ``SRLitModule.step``,
        sr_module.py:113-125): batch maps scale -> (lr, hr) in [0, 1].

        ``constrain`` (optional) is applied to each HR prediction — pass a
        sharding constraint (parallel/sharding.shard_queries) to partition
        the decode over the mesh's 'space' axis.
        """
        items = list(batch.items())
        feats = self._shared_lr_features(params, items)
        loss = 0.0
        preds = {}
        for i, (scale, (lr, hr)) in enumerate(items):
            y = normalize(hr)
            if feats is not None:
                feat, dec, dp = feats
                b = lr.shape[0]
                pred = dec.apply(dp, feat[i * b:(i + 1) * b],
                                 hr.shape[1:3], bsize)
            else:
                pred = self.net.apply(params, normalize(lr),
                                      hr.shape[1:3], bsize)
            if constrain is not None:
                pred = constrain(pred)
            loss = loss + jnp.mean(jnp.abs(pred - y))
            preds[scale] = jnp.clip(denormalize(pred), 0.0, 1.0)
        return loss / len(items), preds

    def _shared_lr_features(self, params, items):
        """Multi-scale batches with one common LR shape (the reference
        training config: 48-px LR patches at joint scales {2,3,4},
        ``configs/default.yaml``) run the ENCODER — 76% of step FLOPs —
        once on the scale-concatenated batch instead of once per scale:
        bit-identical per sample (the batch dim is independent), 3x fewer
        conv launches and 3x the matmul M for the lane-limited cout=64
        encoder convs. Returns (stacked features, decoder, decoder params)
        or None when inapplicable."""
        from tpu_diinn.nn.diinn import DIINN
        if not isinstance(self.net, DIINN) or len(items) < 2:
            return None
        shapes = {lr.shape for _, (lr, _) in items}
        if len(shapes) != 1:
            return None
        enc, dec = _enc_dec_for(self.net)
        p = params["params"] if "params" in params else params
        x = jnp.concatenate([normalize(lr) for _, (lr, _) in items], axis=0)
        feat = enc.apply({"params": p["encoder"]}, x)
        return feat, dec, {"params": p["decoder"]}

    def train_loss(self, params, batch) -> Array:
        loss, _ = self.loss_and_preds(params, batch)
        return loss

    def predict(self, params, lr: Array, size: Tuple[int, int],
                bsize: Optional[int] = None) -> Array:
        """Normalized single-image inference (fixes the reference demo
        quirk): [0,1] in -> [0,1] clamped out."""
        pred = self.net.apply(params, normalize(lr), size,
                              bsize if bsize is not None else self.eval_bsize)
        return jnp.clip(denormalize(pred), 0.0, 1.0)
