"""Bicubic baseline on the shared model contract
(reference ``sr_module.py:53-60``: antialiased bicubic resize)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpu_diinn.core.resize import resize

Array = jnp.ndarray


class BicubicNet(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, size: Tuple[int, int],
                 bsize: Optional[int] = None) -> Array:
        return resize(x, size)
