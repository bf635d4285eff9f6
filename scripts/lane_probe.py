"""Probe the MXU lane-utilization hypothesis (PERF.md).

The RDN encoder's convs all have cout=64 — half the 128 output lanes of the
v5e MXU. Hypothesis: repacking a 3x3 cout-64 stride-1 conv as a 3x4 cout-128
stride-(1,2) conv (each matmul row produces TWO adjacent output columns)
raises throughput: K grows 9cin->12cin (1.33x) but N doubles to a full lane
set, for a theoretical 1.5x (useful-FLOP rate 98.5 -> 147.8 TF/s).

Single dispatches through the remote-TPU tunnel cost ~1 ms regardless of
FLOPs, so each variant runs INNER iterations inside one jitted fori_loop
(a vanishing 1e-30 feedback into the weights defeats CSE without touching
numerics), and the whole loop is timed.

Usage: python scripts/lane_probe.py [--outer 5] [--inner 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer", type=int, default=5)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()
    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    B, H, W = args.batch, args.hw, args.hw
    M = B * H * W
    INNER = args.inner

    def timeit_looped(op, x, w):
        """Time op(x, w) amortized over INNER in-jit iterations."""
        def body(i, w):
            y = op(x, w)
            # feed an effectively-zero scalar back into w: keeps the loop
            # serial (no CSE/elision) without changing values in bf16.
            return w + (y.ravel()[0] * 1e-30).astype(w.dtype)

        f = jax.jit(lambda x, w: jax.lax.fori_loop(0, INNER, body, w))
        r = f(x, w)
        float(r.ravel()[0].astype(jnp.float32))  # compile + tunnel sync
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            r = f(x, w)
            float(r.ravel()[0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / INNER)
        return best

    # --- 1. pure matmul lane probe -------------------------------------
    for K, N in [(576, 64), (576, 128), (1152, 128), (576, 256),
                 (64, 64), (128, 128)]:
        x = jnp.asarray(rng.random((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.random((K, N)) * 0.05, jnp.bfloat16)
        dt = timeit_looped(lambda a, w: a @ w, x, w)
        tf = 2 * M * K * N / dt / 1e12
        print(f"matmul M={M} K={K:4d} N={N:3d}: {dt*1e6:8.1f} us "
              f"{tf:7.1f} TF/s", flush=True)

    # --- 2. conv shapes: baseline vs column-pair packed ------------------
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_base(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    def conv_packed(x, w):
        cout = w.shape[3]
        wp = jnp.concatenate([
            jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0))),
            jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0)))], axis=-1)
        y = jax.lax.conv_general_dilated(
            x, wp, (1, 2), ((1, 1), (1, 2)), dimension_numbers=dn)
        b, h, w2, _ = y.shape
        return y.reshape(b, h, w2 * 2, cout)

    for cin in [64, 192, 320, 576]:
        x = jnp.asarray(rng.random((B, H, W, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, cin, 64)) * 0.05, jnp.bfloat16)
        y0, y1 = conv_base(x, w), conv_packed(x, w)
        err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                    - y1.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(y0.astype(jnp.float32))))
        dt0 = timeit_looped(conv_base, x, w)
        dt1 = timeit_looped(conv_packed, x, w)
        fl = 2 * M * 9 * cin * 64
        print(f"conv3x3 cin={cin:4d} cout=64:  base {dt0*1e6:8.1f} us "
              f"({fl/dt0/1e12:6.1f} TF/s)   packed {dt1*1e6:8.1f} us "
              f"({fl/dt1/1e12:6.1f} TF/s)  speedup {dt0/dt1:5.2f}x  "
              f"relerr {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
