"""Weak-scaling harness: decoded pixels/s at mesh sizes 1/2/4/8.

Measures the BASELINE.json third north-star (>=0.85 weak-scaling efficiency
on v5e-16) on whatever devices exist:

- On a real multi-chip TPU slice, the reported ``weak_scaling_efficiency``
  is the actual target metric: per-device work held constant (fixed
  per-device batch), efficiency_n = px/s(n) / (n * px/s(1)).
- On a single host with virtual CPU devices
  (``--xla_force_host_platform_device_count=N``), all "devices" share the
  same physical cores, so throughput cannot scale; the meaningful number is
  ``sharding_overhead``: measured step time at mesh n vs n x (mesh-1 step
  time) for the same per-device work. Overhead ~0 means the GSPMD
  partitioning + gradient psum insert no extra work beyond the collectives
  themselves, i.e. nothing in this framework's train step blocks scaling.

The data-parallel train step is the same ``loop.make_train_step`` the real
trainer uses (grad psum over the 'data' axis inserted by XLA; reference DDP
equivalent, ``configs/default.yaml:70-72``).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --out SCALING.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mesh_sizes, per_device_batch, patch, scale, encoder, hidden,
            iters, warmup=2):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_diinn.config.config import load_config
    from tpu_diinn.train import loop
    from tpu_diinn.train.optim import make_optimizer
    from tpu_diinn.parallel.mesh import make_mesh

    results = []
    for n in mesh_sizes:
        if n > len(jax.devices()):
            break
        batch = per_device_batch * n
        cfg = load_config(None, [
            "model.arch=diinn", f"model.encoder={encoder}",
            f"model.hidden_dims={hidden}",
            f"data.batch_size={batch}", f"data.patch_size={patch}",
            f"data.train_scales=[{scale}]",
        ])
        task = loop.build_task(cfg)
        tx = make_optimizer(1e-4, 1000)
        state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
        mesh = make_mesh(data=n, space=1, devices=jax.devices()[:n])
        rng = np.random.default_rng(0)
        b = {scale: (
            rng.random((batch, patch, patch, 3)).astype(np.float32),
            rng.random((batch, patch * scale, patch * scale, 3)
                       ).astype(np.float32))}
        placed = loop.shard_batch(b, mesh)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
        step = loop.make_train_step(task, tx, mesh)
        for _ in range(warmup):
            state, m = step(state, placed)
        float(m["loss"])  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, placed)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        px = batch * (patch * scale) ** 2
        results.append({"mesh": n, "global_batch": batch,
                        "step_time_s": dt, "pixels_per_s": px / dt})
    base = results[0]
    for r in results:
        n = r["mesh"]
        r["weak_scaling_efficiency"] = (
            r["pixels_per_s"] / (n * base["pixels_per_s"]))
        # on host-shared virtual devices the ideal step time is n * t_1
        # (same cores do n x the work); overhead is what GSPMD adds on top
        r["sharding_overhead"] = (
            r["step_time_s"] / (n * base["step_time_s"]) - 1.0)
    return results


def render_md(results, platform, n_cores, args) -> str:
    shared_host = platform == "cpu"
    lines = [
        "# SCALING — data-parallel weak scaling",
        "",
        f"Harness: `scripts/scaling_bench.py` — the real `loop.make_train_"
        f"step` (grad psum over the mesh 'data' axis) at fixed per-device "
        f"batch {args.per_device_batch}, DIINN decoder + `{args.encoder}` "
        f"encoder, {args.patch}px patches at x{args.scale}, "
        f"{args.iters} timed steps.",
        "",
        f"Platform: **{platform}** ({len(results)} mesh sizes, "
        f"{n_cores} host cores).",
        "",
    ]
    if shared_host:
        lines += [
            "All mesh devices here are *virtual CPU devices on one "
            f"{n_cores}-core host*: they time-share the same cores, so "
            "pixel throughput cannot increase with mesh size and "
            "`weak_scaling_efficiency` trends as ~1/n by construction. The "
            "meaningful column is **sharding overhead** — measured step "
            "time vs n x the mesh-1 step time for identical per-device "
            "work. ~0 means the GSPMD-partitioned step adds nothing beyond "
            "the collectives; the >=0.85 efficiency target (BASELINE.md) "
            "must be re-measured with this same harness when a real "
            "multi-chip slice is available.",
            "",
        ]
    lines += [
        "| mesh (data) | global batch | step time (s) | decoded px/s | "
        "weak-scaling eff. | sharding overhead |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['mesh']} | {r['global_batch']} | "
            f"{r['step_time_s']:.4f} | {r['pixels_per_s']:,.0f} | "
            f"{r['weak_scaling_efficiency']:.3f} | "
            f"{r['sharding_overhead']:+.3f} |")
    lines += [
        "",
        "Correctness of the sharded step (bit-parity vs unsharded, "
        "disjoint per-host data, fused-kernel-under-mesh) is covered by "
        "`tests/test_train.py` / `tests/test_sharding.py`; the 8-device "
        "full-train-step dryrun runs every round (`__graft_entry__."
        "dryrun_multichip`, MULTICHIP_r*.json).",
        "",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-sizes", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--patch", type=int, default=24)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--encoder", default="edsr-baseline-tiny")
    ap.add_argument("--hidden", default="[32,32]")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=None, help="write SCALING.md here")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                    help="'cpu' = virtual CPU devices (default; env vars "
                    "alone do not override the sitecustomize-pinned TPU "
                    "platform); 'native' = whatever jax.devices() offers "
                    "(use on a real multi-chip slice)")
    ap.add_argument("--cpu-devices", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    results = measure(sizes, args.per_device_batch, args.patch, args.scale,
                      args.encoder, args.hidden, args.iters)
    platform = jax.devices()[0].platform
    for r in results:
        print(json.dumps({"platform": platform, **r}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"platform": platform, "results": results}, f,
                      indent=1)
    if args.out:
        md = render_md(results, platform, os.cpu_count(), args)
        with open(args.out, "w") as f:
            f.write(md)


if __name__ == "__main__":
    main()
