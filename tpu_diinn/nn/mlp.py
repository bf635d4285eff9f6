"""MLP applied over the last axis (reference ``src/models/components/mlp.py``).

On TPU there is no need to flatten leading dims — Dense contracts the last
axis directly and XLA tiles the matmul over everything else.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu_diinn.nn.layers import Dense

Array = jnp.ndarray


class MLP(nn.Module):
    out_dim: int
    hidden: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, h in enumerate(self.hidden):
            x = nn.relu(Dense(h, dtype=self.dtype, name=f"fc{i}")(x))
        return Dense(self.out_dim, dtype=self.dtype,
                     name=f"fc{len(self.hidden)}")(x)
