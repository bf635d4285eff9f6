"""Benchmark-set evaluation CLI (reference ``benchmarks.py``):

    python -m tpu_diinn.cli.benchmarks --ckpt_path ./checkpoints \
        [--bicubic_test] [--scales 3.14 4 8] [--testsets Set5 Set14 ...]

Evaluates PSNR/SSIM/LR-PSNR per scale on the benchmark sets
(reference defaults: B100/Set5/Set14/Urban100 at scales {3.14, 4, 8},
``benchmarks.py:12``).
"""

from __future__ import annotations

import argparse
import json

from tpu_diinn.config.config import Config, load_config
from tpu_diinn.data.datasets import SRDatasetDownsample
from tpu_diinn.nn.registry import make_net
from tpu_diinn.train import loop
from tpu_diinn.train.checkpoint import load_params
from tpu_diinn.train.task import SRTask


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--bicubic_test", action="store_true")
    p.add_argument("--root", type=str, default="./data/")
    p.add_argument("--scales", type=float, nargs="+", default=[3.14, 4, 8])
    p.add_argument("--testsets", type=str, nargs="+",
                   default=["B100", "Set5", "Set14", "Urban100"])
    p.add_argument("--max_images", type=int, default=None)
    args, overrides = p.parse_known_args(argv)
    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()

    if args.bicubic_test:
        cfg = load_config(None, ["model.arch=bicubic"] + overrides)
        task = loop.build_task(cfg)
        params = {}
    else:
        state, meta = load_params(args.ckpt_path, "best")
        cfg = load_config(None, overrides)
        from tpu_diinn.config.config import _merge
        _merge(cfg, meta["config"])
        task = loop.build_task(cfg)
        params = state["params"] if isinstance(state, dict) else state.params

    results = {}
    jit_cache = loop.EvalJit(task)
    for name in args.testsets:
        ds = SRDatasetDownsample(root=args.root, name="benchmark", split=name,
                                 scales=args.scales, patch_size=0,
                                 augment=False)
        if len(ds) == 0:
            print(f"[skip] {name}: no images under {args.root}")
            continue
        res = loop.test_metrics(task, params, ds, cfg,
                                max_images=args.max_images,
                                jit_cache=jit_cache)
        results[name] = res
        print(name, json.dumps(res, indent=2))
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
