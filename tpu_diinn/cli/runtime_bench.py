"""Decode-latency comparison across model families (reference
``runtime_test.py`` — which shipped broken due to a stale ``imsisr`` import;
this is the working equivalent).

    python -m tpu_diinn.cli.runtime_bench [--scales 2 3 4 6 8] [--iters 50]

Measures single-image decode latency of bicubic/MetaSR/LIIF/DIINN on a
1x48x48x3 input at each scale, with host-fetch-synced timing.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scales", type=float, nargs="+", default=[2, 3, 4, 6, 8])
    p.add_argument("--archs", type=str, nargs="+",
                   default=["bicubic", "metasr", "liif", "diinn"])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--input", type=int, default=48)
    p.add_argument("--encoder", type=str, default="rdn")
    args, _ = p.parse_known_args(argv)

    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from tpu_diinn.nn.registry import make_net
    from tpu_diinn.train.profiling import synced_time

    n = args.input
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, n, n, 3))
    results = {}
    for arch in args.archs:
        net = make_net(arch, encoder_spec=args.encoder)
        params = net.init(jax.random.PRNGKey(1), x[:, :8, :8], (16, 16))
        for s in args.scales:
            size = (int(n * s), int(n * s))
            f = jax.jit(lambda p_, x_: net.apply(p_, x_, size))
            ms = synced_time(f, params, x, iters=args.iters) * 1e3
            results[f"{arch}_x{s:g}"] = round(ms, 3)
            print(f"{arch:8s} x{s:<4g} {size[0]}x{size[1]}: {ms:8.3f} ms",
                  flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
