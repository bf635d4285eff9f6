"""A/B: full-image decode with the 2-D tiled fused kernel vs the XLA path.

Round-4 verdict #4 asked for decode-only throughput before/after letting
the fused kernel fire on benchmark-sized full images. Times
``task.predict`` (the exact benchmark-eval decode, chunked XLA path with
``model.use_fused=false`` vs the tiled Pallas kernel with the default
auto gate) on a benchmark-sized LR input at integer scales.

Usage: python scripts/fullimage_decode_ab.py [--ckpt results/flagship_weights.npz]
       [--size 128] [--scales 2 4] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="results/flagship_weights.npz")
    p.add_argument("--size", type=int, default=128,
                   help="LR input side (128 ~ B100-x4-sized)")
    p.add_argument("--scales", type=int, nargs="+", default=[2, 4])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from tpu_diinn.config.config import load_config, _merge, _set_dotted
    from tpu_diinn.train import loop
    from tpu_diinn.train.checkpoint import load_params

    state, meta = load_params(args.ckpt, "best")
    params = state["params"] if isinstance(state, dict) else state.params
    # npz loads give numpy leaves — commit them to the device ONCE, or every
    # jitted call re-uploads ~90 MB of weights through the tunnel
    params = jax.device_put(params)
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (1, args.size, args.size, 3))

    results = {}
    for fused in (False, True):
        cfg = load_config(None, [])
        _merge(cfg, meta["config"])
        _set_dotted(cfg, "model.use_fused", "true" if fused else "false")
        task = loop.build_task(cfg)
        for s in args.scales:
            size = (args.size * s, args.size * s)
            f = jax.jit(lambda p_, x_: task.predict(p_, x_, size))
            y = f(params, x)
            float(jnp.sum(y))              # compile + real completion sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = f(params, x)
            float(jnp.sum(y))
            dt = (time.perf_counter() - t0) / args.iters
            px_s = size[0] * size[1] / dt
            key = f"{'fused' if fused else 'xla'}_x{s}"
            results[key] = {"ms": round(dt * 1e3, 2),
                            "Mpx_s": round(px_s / 1e6, 2)}
            print(key, results[key], flush=True)
    for s in args.scales:
        a, b = results[f"xla_x{s}"]["ms"], results[f"fused_x{s}"]["ms"]
        results[f"speedup_x{s}"] = round(a / b, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
