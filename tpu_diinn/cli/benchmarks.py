"""Benchmark-set evaluation CLI (reference ``benchmarks.py``):

    python -m tpu_diinn.cli.benchmarks --ckpt_path ./checkpoints \
        [--bicubic_test] [--scales 3.14 4 8] [--testsets Set5 Set14 ...]

Evaluates PSNR/SSIM/LR-PSNR per scale on the benchmark sets
(reference defaults: B100/Set5/Set14/Urban100 at scales {3.14, 4, 8},
``benchmarks.py:12``). Dataset assembly goes through
``loop.make_test_datasets`` (the config-driven path, reference
``sr_datamodule.py:110-135``), with the CLI flags mapped onto
``cfg.data.testsets`` / ``cfg.data.test_scales``.

By default DIINN checkpoints are evaluated through the bucketed
static-shape path (``train/bucketed.py``): images are padded to a small
set of bucket canvases so the whole run costs a handful of TPU compiles
instead of one per image shape. ``--eval_buckets 0`` restores the exact
per-shape jit.
"""

from __future__ import annotations

import argparse
import json
import time

from tpu_diinn.config.config import load_config
from tpu_diinn.train import loop
from tpu_diinn.train.checkpoint import load_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--bicubic_test", action="store_true")
    p.add_argument("--root", type=str, default="./data/")
    p.add_argument("--scales", type=float, nargs="+", default=[3.14, 4, 8])
    p.add_argument("--testsets", type=str, nargs="+",
                   default=["B100", "Set5", "Set14", "Urban100"])
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--eval_buckets", type=int, default=64, metavar="QUANTUM",
                   help="bucket quantum for static-shape eval (0 = exact "
                        "per-shape jit)")
    args, overrides = p.parse_known_args(argv)
    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()

    if args.bicubic_test:
        cfg = load_config(None, ["model.arch=bicubic"] + overrides)
        task = loop.build_task(cfg)
        params = {}
    else:
        state, meta = load_params(args.ckpt_path, "best")
        # checkpoint config first, THEN command-line overrides (overrides
        # must win — e.g. model.use_fused=false to A/B the kernel path)
        from tpu_diinn.config.config import _merge, _set_dotted
        cfg = load_config(None, [])
        _merge(cfg, meta["config"])
        for ov in overrides:
            key, _, val = ov.lstrip("-").partition("=")
            _set_dotted(cfg, key, val)
        task = loop.build_task(cfg)
        params = state["params"] if isinstance(state, dict) else state.params
        # npz loads give numpy leaves: commit to device once, or every
        # per-image eval call re-uploads the full weight set
        import jax
        params = jax.device_put(params)

    # CLI flags drive the config-level dataset assembly (make_test_datasets)
    cfg.data.root = args.root
    cfg.data.test_scales = list(args.scales)
    cfg.data.testsets = [
        ("DIV2K", "train") if name == "DIV2K" else ("benchmark", name)
        for name in args.testsets]
    datasets = loop.make_test_datasets(cfg)

    jit_cache = None
    if args.eval_buckets and not args.bicubic_test:
        from tpu_diinn.train.bucketed import BucketedEval, BucketedUnsupported
        try:
            jit_cache = BucketedEval(task, quantum=args.eval_buckets)
        except BucketedUnsupported as e:
            print(f"[bucketed eval unavailable: {e}; exact-shape jit]")
    if jit_cache is None:
        jit_cache = loop.EvalJit(task)

    results = {}
    t0 = time.time()
    for name, ds in datasets.items():
        if len(ds) == 0:
            print(f"[skip] {name}: no images under {args.root}")
            continue
        res = loop.test_metrics(task, params, ds, cfg,
                                max_images=args.max_images,
                                jit_cache=jit_cache)
        results[name] = res
        print(name, json.dumps(res, indent=2))
    if hasattr(jit_cache, "n_programs"):
        print(f"[bucketed eval: {jit_cache.n_programs} compiled programs, "
              f"{time.time() - t0:.1f}s total]")
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
