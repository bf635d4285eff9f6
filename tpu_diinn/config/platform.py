"""Platform selection helper for CLI entry points.

The deployment environment may pin a remote TPU platform through
sitecustomize-level config that overrides ``JAX_PLATFORMS``. CLIs call
``apply_platform_env()`` first, honoring:

- ``TPU_DIINN_PLATFORM``: 'cpu' | 'tpu'/'axon' | '' (default: leave as-is)
- ``TPU_DIINN_CPU_DEVICES``: virtual CPU device count (for mesh testing)
- ``TPU_DIINN_COMPILE_CACHE``: persistent XLA compilation cache dir
  (default ``~/.cache/tpu_diinn_xla``; set to '0' to disable). TPU
  compiles of the flagship graph take minutes through the remote
  compiler — the cache makes every later run (resume, eval, bench)
  skip them.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    import jax

    plat = os.environ.get("TPU_DIINN_PLATFORM", "").strip().lower()
    if plat == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif plat in ("tpu", "axon"):
        pass  # default registration already targets the TPU
    n = os.environ.get("TPU_DIINN_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))
    cache = os.environ.get("TPU_DIINN_COMPILE_CACHE", "").strip()
    if cache != "0":
        jax.config.update("jax_compilation_cache_dir",
                          cache or os.path.expanduser("~/.cache/tpu_diinn_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
