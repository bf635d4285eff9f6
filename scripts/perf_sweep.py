"""Single-chip perf sweep: batch sizes + per-segment roofline (PERF.md).

Measures, on the real TPU chip:
1. full train-step throughput (fwd+bwd+Adam) at several batch sizes;
2. encoder-only and decoder-only fwd+bwd steps, to place each segment
   against its attainable throughput (the RDN encoder's 64-channel convs
   cap it at ~98.5 TF/s on a 128-lane MXU; see PERF.md).

Timing protocol per the repo's tunnel rules: block_until_ready does not
guarantee remote completion, so every timed region ends with a scalar
host fetch.

Usage:  python scripts/perf_sweep.py [--batches 8,16,32] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, args, iters, sync):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def time_step(step, state, batch, iters):
    """Time a donated train step (threads state like the real loop)."""
    state, m = step(state, batch)
    float(m["loss"])
    state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])  # host fetch = the only reliable tunnel sync
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--patch", type=int, default=48)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--segments", action="store_true",
                    help="also measure encoder-only / decoder-only steps")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tpu_diinn.config.config import load_config
    from tpu_diinn.config.platform import apply_platform_env
    from tpu_diinn.train import loop
    from tpu_diinn.train import flops as F
    from tpu_diinn.train.optim import make_optimizer

    apply_platform_env()
    patch, scale = args.patch, args.scale
    rng = np.random.default_rng(0)
    rows = []

    for batch in [int(b) for b in args.batches.split(",")]:
        cfg = load_config(None, [
            "model.arch=diinn", "model.dtype=bfloat16",
            f"data.batch_size={batch}", f"data.patch_size={patch}",
            f"data.train_scales=[{scale}]",
        ])
        task = loop.build_task(cfg)
        tx = make_optimizer(1e-4, 1000)
        state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
        b = {scale: (
            jnp.asarray(rng.random((batch, patch, patch, 3)),
                        jnp.float32),
            jnp.asarray(rng.random((batch, patch * scale, patch * scale, 3)),
                        jnp.float32))}
        step = loop.make_train_step(task, tx, mesh=None)
        dt = time_step(step, state, b, args.iters)
        fl = F.train_step_flops(batch, patch, [scale])
        row = {
            "kind": "train_step", "batch": batch,
            "step_time_s": round(dt, 5),
            "pixels_per_s": round(batch * (patch * scale) ** 2 / dt, 1),
            "model_tflops_per_s": round(fl["total"] / dt / 1e12, 1),
            "mfu_bf16": round(F.mfu(fl["total"], dt), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        if args.segments and batch == 16:
            from tpu_diinn.nn.registry import make_encoder
            from tpu_diinn.nn.diinn import ImplicitDecoder

            enc = make_encoder("rdn", dtype=jnp.bfloat16)
            x = b[scale][0]
            ep = enc.init(jax.random.PRNGKey(0), x)

            @jax.jit
            def enc_step(p, x):
                def lf(p):
                    f = enc.apply(p, x)
                    return jnp.mean(jnp.square(f.astype(jnp.float32)))
                return jax.value_and_grad(lf)(p)

            dt_e = time_fn(enc_step, (ep, x), args.iters,
                           lambda o: float(o[0]))
            enc_fl = 3 * 2 * F.rdn_macs_per_px() * batch * patch * patch
            rows.append({
                "kind": "encoder_only", "batch": batch,
                "step_time_s": round(dt_e, 5),
                "tflops_per_s": round(enc_fl / dt_e / 1e12, 1),
                "pct_of_lane_limited_98.5TF": round(
                    enc_fl / dt_e / 98.5e12 * 100, 1),
            })
            print(json.dumps(rows[-1]), flush=True)

            dec = ImplicitDecoder(in_channels=64, hidden_dims=(256,) * 4,
                                  mode=3, init_q=False, dtype=jnp.bfloat16)
            feat = jnp.asarray(rng.random((batch, patch, patch, 64)),
                               jnp.float32)
            hr = b[scale][1]
            size = (patch * scale, patch * scale)
            dp = dec.init(jax.random.PRNGKey(1), feat, size)

            @jax.jit
            def dec_step(p, f):
                def lf(p):
                    out = dec.apply(p, f, size)
                    return jnp.mean(jnp.abs(out - hr))
                return jax.value_and_grad(lf)(p)

            dt_d = time_fn(dec_step, (dp, feat), args.iters,
                           lambda o: float(o[0]))
            dec_fl = 3 * 2 * (
                F.decoder_lr_macs_per_px() * batch * patch * patch
                + F.decoder_hr_macs_per_query() * batch
                * (patch * scale) ** 2)
            rows.append({
                "kind": "decoder_only", "batch": batch,
                "step_time_s": round(dt_d, 5),
                "tflops_per_s": round(dec_fl / dt_d / 1e12, 1),
                "pct_of_peak_197TF": round(dec_fl / dt_d / 197e12 * 100, 1),
            })
            print(json.dumps(rows[-1]), flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
