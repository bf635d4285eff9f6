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
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray

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
        loss = 0.0
        preds = {}
        for scale, (lr, hr) in batch.items():
            x = normalize(lr)
            y = normalize(hr)
            pred = self.net.apply(params, x, hr.shape[1:3], bsize)
            if constrain is not None:
                pred = constrain(pred)
            loss = loss + jnp.mean(jnp.abs(pred - y))
            preds[scale] = jnp.clip(denormalize(pred), 0.0, 1.0)
        return loss / len(batch), preds

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
