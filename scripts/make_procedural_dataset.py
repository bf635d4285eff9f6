"""Generate a procedural natural-image-like SR dataset in DIV2K layout.

The build environment has no network egress, so real DIV2K/benchmark data
cannot be fetched. This script synthesizes a deterministic, structured HR
image corpus ("PROC-DIV2K") with the statistics SR training needs — sharp
edges, multi-octave textures, smooth gradients, periodic patterns — and
writes it in the exact directory structure the reference expects
(``srdata.py:11-40``): ``DIV2K/DIV2K_train_HR`` plus four benchmark sets.

A model trained on this corpus must beat bicubic by a clear margin for the
framework's training stack to be considered demonstrated end-to-end; results
land in BASELINE.md.

Usage:
    python scripts/make_procedural_dataset.py [--root ./data] [--n-train 180]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def _smooth_noise(rng, size, cells):
    """One octave: low-res noise bicubic-upsampled to `size`."""
    base = rng.random((cells, cells, 3)).astype(np.float32)
    im = Image.fromarray((base * 255).astype(np.uint8))
    return np.asarray(im.resize((size, size), Image.BICUBIC),
                      dtype=np.float32) / 255.0


def _fractal_texture(rng, size):
    """Multi-octave 1/f-ish texture."""
    img = np.zeros((size, size, 3), np.float32)
    amp, total = 1.0, 0.0
    for cells in (4, 8, 16, 32, 64):
        img += amp * _smooth_noise(rng, size, cells)
        total += amp
        amp *= 0.55
    return img / total


def _gradient(rng, size):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    a, b = rng.random(2) * 2 - 1
    g = (a * x + b * y - min(a + b, 0)) / (abs(a) + abs(b) + 1e-6)
    c0, c1 = rng.random(3), rng.random(3)
    return (g[..., None] * c0 + (1 - g[..., None]) * c1).astype(np.float32)


def _add_shapes(rng, img):
    """Sharp-edged rectangles / circles / lines — the content where learned
    SR beats bicubic."""
    size = img.shape[0]
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(int(rng.integers(6, 14))):
        color = rng.random(3).astype(np.float32)
        alpha = 0.45 + 0.55 * float(rng.random())
        kind = int(rng.integers(0, 3))
        if kind == 0:  # rotated rectangle
            cx, cy = rng.random(2) * size
            th = float(rng.random()) * np.pi
            w, h = (0.05 + 0.25 * rng.random(2)) * size
            xr = (x - cx) * np.cos(th) + (y - cy) * np.sin(th)
            yr = -(x - cx) * np.sin(th) + (y - cy) * np.cos(th)
            mask = (np.abs(xr) < w) & (np.abs(yr) < h)
        elif kind == 1:  # circle
            cx, cy = rng.random(2) * size
            r = (0.04 + 0.18 * float(rng.random())) * size
            mask = (x - cx) ** 2 + (y - cy) ** 2 < r * r
        else:  # thick line
            cx, cy = rng.random(2) * size
            th = float(rng.random()) * np.pi
            d = np.abs((x - cx) * np.sin(th) - (y - cy) * np.cos(th))
            mask = d < (1 + 5 * float(rng.random()))
        img[mask] = (1 - alpha) * img[mask] + alpha * color
    return img


def _add_periodic(rng, img):
    """Stripes/checker patches at random frequency+angle (alias-critical)."""
    size = img.shape[0]
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(int(rng.integers(1, 4))):
        cx, cy = rng.random(2) * size
        r = (0.1 + 0.25 * float(rng.random())) * size
        region = (x - cx) ** 2 + (y - cy) ** 2 < r * r
        freq = 0.08 + 0.55 * float(rng.random())
        th = float(rng.random()) * np.pi
        wave = np.sin(freq * ((x * np.cos(th) + y * np.sin(th))))
        pattern = (wave > 0).astype(np.float32)
        color = rng.random(3).astype(np.float32)
        m = region[..., None] * 0.6
        img = img * (1 - m) + m * (pattern[..., None] * color
                                   + (1 - pattern[..., None]) * (1 - color))
    return img


def make_image(seed: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([77, seed]))
    base = 0.6 * _fractal_texture(rng, size) + 0.4 * _gradient(rng, size)
    img = _add_shapes(rng, base)
    img = _add_periodic(rng, img)
    img = np.clip(img, 0.0, 1.0)
    return (img * 255).round().astype(np.uint8)


def write_set(directory: Path, n: int, size: int, seed0: int,
              prefix: str) -> None:
    directory.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        path = directory / f"{prefix}{i:04d}.png"
        if path.exists():
            continue
        Image.fromarray(make_image(seed0 + i, size)).save(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./data")
    p.add_argument("--n-train", type=int, default=180,
                   help="DIV2K-layout images (8/9 train + 1/9 val split)")
    p.add_argument("--size", type=int, default=408,
                   help="HR image size (must exceed round(48*4)=192 crops)")
    args = p.parse_args()
    root = Path(args.root)

    write_set(root / "DIV2K" / "DIV2K_train_HR", args.n_train, args.size,
              seed0=0, prefix="")
    # benchmark stand-ins, disjoint seeds from the train corpus
    for name, n, size, s0 in (("Set5", 5, 256, 10_000),
                              ("Set14", 14, 256, 20_000),
                              ("B100", 20, 256, 30_000),
                              ("Urban100", 10, 408, 40_000)):
        write_set(root / "benchmark" / name / "HR", n, size, s0, "img")
    print(f"dataset ready under {root}")


if __name__ == "__main__":
    main()
