"""Microbenchmark the fused decoder kernel (int path) on the real chip.

Times the fused Pallas decode forward and forward+backward at the training
shape (B=16, 48x48 LR -> x4) against the HR-chain matmul roofline. This is
the tool behind PERF.md's round-4 section; the one-off ablation variants it
hosted (materialised repeat vs broadcast-add, [Wkq|Wq] concat GEMMs,
sine-free chains, dual interleaved chains, bf16 elementwise, bwd tile
sizes) live in git history (round-4 commits) with their conclusions
recorded in PERF.md — the winning recipe is the production kernel.

Usage: python scripts/kernel_probe.py [--batch 16] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters, sync):
    out = fn()
    sync(out)
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)   # host fetch = the only reliable sync on the tunneled TPU
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--patch", type=int, default=48)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_diinn.kernels import decoder_fused as K
    from tpu_diinn.core import grids

    b, p, s = args.batch, args.patch, args.scale
    h_out = w_out = p * s
    hidden, n_layers = 256, 4
    ch_all = hidden * n_layers

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((b, p, p, ch_all)), jnp.bfloat16)
    syn = jnp.asarray(grids.syn_input_grid((p, p), (h_out, w_out),
                                           dtype=jnp.float32))
    params = {
        "w0": jnp.asarray(rng.standard_normal((3, hidden)) * 0.1,
                          jnp.bfloat16),
        "b0": jnp.zeros((hidden,), jnp.float32),
        "wkq": jnp.asarray(
            rng.standard_normal((n_layers - 1, hidden, hidden)) * 0.06,
            jnp.bfloat16),
        "bkq": jnp.zeros((n_layers - 1, hidden), jnp.float32),
        "wq": jnp.asarray(
            rng.standard_normal((n_layers - 1, hidden, hidden)) * 0.06,
            jnp.bfloat16),
        "bq": jnp.zeros((n_layers - 1, hidden), jnp.float32),
        "wl": jnp.asarray(rng.standard_normal((hidden, 3)) * 0.1,
                          jnp.bfloat16),
        "bl": jnp.zeros((3,), jnp.float32),
    }

    # HR-chain matmul model FLOPs (fwd)
    px = b * h_out * w_out
    fwd_fl = 2 * px * (3 * hidden + (n_layers - 1) * 2 * hidden * hidden
                       + hidden * 3)

    fwd = jax.jit(lambda z, syn: K.decode_fused(z, syn, (h_out, w_out),
                                                params))
    fwdbwd = jax.jit(jax.grad(
        lambda z, syn: jnp.sum(K.decode_fused(z, syn, (h_out, w_out),
                                              params))))

    for name, fn, fl in (("fwd", fwd, fwd_fl),
                         ("fwd_bwd", fwdbwd, 3 * fwd_fl)):
        dt = timeit(lambda: fn(z, syn), args.iters,
                    lambda o: float(jnp.sum(o[0, 0, 0])))
        print(json.dumps({
            "name": name, "ms": round(dt * 1e3, 3),
            "hr_chain_tflops_per_s": round(fl / dt / 1e12, 1),
            "pct_of_197tf_peak": round(fl / dt / 197e12 * 100, 1),
            "matmul_sol_ms": round(fl / 197e12 * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
