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


_DIST_INITIALIZED = False


def maybe_init_distributed() -> None:
    """Initialize jax.distributed from standard env vars when present.

    Must run BEFORE anything touches a jax backend: querying
    ``jax.process_count()`` first (as a naive "already initialized?" check
    would) creates the single-process backend and makes a later
    ``distributed.initialize`` a no-op — which is why the guard here is a
    module flag, not a backend query. On CPU platforms the cross-process
    collective implementation is selected too (gloo), so a 2-process CPU
    run exercises the same code path as multi-host TPU."""
    global _DIST_INITIALIZED
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if _DIST_INITIALIZED or not coord:
        return
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu" or \
            os.environ.get("TPU_DIINN_PLATFORM", "").strip() == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    _DIST_INITIALIZED = True


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
