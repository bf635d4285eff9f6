"""Test configuration: force an 8-device virtual CPU platform.

Sharding/pjit/shard_map logic is exercised on a virtual multi-device CPU mesh
(the standard JAX way to test multi-chip code without a pod); numerics tests
also run on CPU for speed and determinism.

Note: this environment force-registers a remote TPU platform ('axon') through
sitecustomize and pins JAX_PLATFORMS=axon, so plain env vars are not enough —
we must override the jax config after import, before any backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
