"""Device mesh construction: data x space axes over ICI/DCN.

TPU-native replacement for the reference's DDP/NCCL layer (``configs/
default.yaml:70-72``): a 2-D ``jax.sharding.Mesh`` whose 'data' axis carries
batch parallelism (gradient psum) and whose 'space' axis shards the HR query
grid / feature maps for decode-side parallelism (SURVEY.md §2.3).

Multi-host: call ``maybe_init_distributed()`` once per process before mesh
construction; jax global devices then span all hosts and the same mesh code
runs unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def maybe_init_distributed() -> None:
    """Initialize jax.distributed from standard env vars when present."""
    if jax.process_count() > 1:
        return  # already initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))


def make_mesh(data: int = -1, space: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a ('data', 'space') mesh. ``data=-1`` uses all remaining
    devices after the space axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if space < 1:
        space = 1
    if data == -1:
        assert n % space == 0, (n, space)
        data = n // space
    assert data * space <= n, (data, space, n)
    devs = devs[: data * space].reshape(data, space)
    return Mesh(devs, ("data", "space"))
