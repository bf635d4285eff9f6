"""Shared helpers for reference-parity fixtures.

Golden fixtures avoid committing megabytes of weights: the fixture stores the
torch ``state_dict`` *names and shapes* plus inputs/outputs/grads, and both
the generator (scripts/gen_golden_models.py, runs against /root/reference)
and the tests regenerate identical weight values deterministically with
``fill_values``.
"""

from __future__ import annotations

import numpy as np


def fill_values(names: list[str], shapes: list[tuple[int, ...]],
                seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic pseudo-init: N(0, 1/sqrt(fan_in)) weights, small biases.

    fan_in is inferred from the torch shape convention: conv OIHW ->
    I*kh*kw, linear (O, I) -> I, bias (O,) -> scale 0.01.
    """
    rng = np.random.default_rng(seed)
    out = {}
    for name, shape in zip(names, shapes):
        shape = tuple(int(s) for s in shape)
        if len(shape) == 4:
            scale = 1.0 / np.sqrt(shape[1] * shape[2] * shape[3])
        elif len(shape) == 2:
            scale = 1.0 / np.sqrt(shape[1])
        else:
            scale = 0.01
        out[name] = (rng.standard_normal(shape) * scale).astype(np.float32)
    return out
