"""A/B the lane-packed encoder convs on the full flagship train step.

Times the real jitted train step (fwd+bwd+Adam, bf16, batch 8, 48px @ x4 —
the bench.py protocol) with model.lane_pack off vs on. Full-graph pipelined
timing (one host fetch at the end) is the only reliable protocol through the
remote-TPU tunnel.

Usage: python scripts/lane_ab.py [--iters 30] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=48)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_diinn.config.config import load_config
    from tpu_diinn.config.platform import apply_platform_env
    from tpu_diinn.train import loop
    from tpu_diinn.train import flops as F
    from tpu_diinn.train.optim import make_optimizer

    apply_platform_env()
    batch, patch, scale = args.batch, args.patch, args.scale
    rng = np.random.default_rng(0)
    b = {scale: (
        jnp.asarray(rng.random((batch, patch, patch, 3)), jnp.float32),
        jnp.asarray(rng.random((batch, patch * scale, patch * scale, 3)),
                    jnp.float32))}
    fl = F.train_step_flops(batch, patch, [scale])

    for lane_pack in ("false", "true"):
        cfg = load_config(None, [
            "model.arch=diinn", "model.dtype=bfloat16",
            f"model.lane_pack={lane_pack}",
            f"data.batch_size={batch}", f"data.patch_size={patch}",
            f"data.train_scales=[{scale}]",
        ])
        task = loop.build_task(cfg)
        tx = make_optimizer(1e-4, 1000)
        state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
        step = loop.make_train_step(task, tx, mesh=None)
        state, m = step(state, b)
        loss0 = float(m["loss"])
        state, m = step(state, b)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, b)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "lane_pack": lane_pack, "step_time_s": round(dt, 5),
            "pixels_per_s": round(batch * (patch * scale) ** 2 / dt, 1),
            "model_tflops_per_s": round(fl["total"] / dt / 1e12, 1),
            "first_loss": round(loss0, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
