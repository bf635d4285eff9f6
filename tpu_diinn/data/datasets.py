"""SR datasets: DIV2K / benchmark directory layouts, on-the-fly downsampling.

Host-side numpy re-implementation of the reference data components
(``src/datamodules/components/srdata.py``):

- ``SRDatasetDownsample`` (``srdata.py:168-237``): scans HR images; per item
  and per scale takes a random HR crop of ``round(patch_size * scale)`` and
  antialias-bicubic-downsamples it to ``patch_size`` (training), or the full
  image with ``lr = resize(hr, round(H/s))`` (``patch_size=0``, eval).
  Augmentation = shared random hflip/vflip/transpose (``srdata.py:191-204``).
- ``SRDatasetPaired`` (``srdata.py:42-161``): classic EDSR-style loader of
  pre-generated ``LR_bicubic/X{s}`` files with paired random crops.
- ``SyntheticSRDataset``: deterministic random images, for smoke tests and
  benchmarking without DIV2K on disk.

Randomness is explicit (``numpy.random.Generator`` passed per call) so the
pipeline is reproducible and shardable across hosts.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np

from tpu_diinn.core.resize import resize_by_scale_size, resize_np

# Mirrors reference DATASET_DIR_STRUCTURE (srdata.py:11-40).
DATASET_DIR_STRUCTURE = {
    "DIV2K": {
        "train": {"hr_dir": "DIV2K_train_HR",
                  "lr_dir": "DIV2K_train_LR_bicubic"},
        "test": {"hr_dir": "DIV2K_test_HR",
                 "lr_dir": "DIV2K_test_LR_bicubic"},
    },
    "benchmark": {
        name: {"hr_dir": f"{name}/HR", "lr_dir": f"{name}/LR_bicubic"}
        for name in ("B100", "Set5", "Set14", "Urban100")
    },
}

Sample = Dict[float, Tuple[np.ndarray, np.ndarray, str]]


def _read_image(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _augment(imgs: List[np.ndarray], rng: np.random.Generator
             ) -> List[np.ndarray]:
    hflip, vflip, dflip = rng.random(3) < 0.5
    out = []
    for x in imgs:
        if hflip:
            x = x[::-1, :, :]
        if vflip:
            x = x[:, ::-1, :]
        if dflip:
            x = np.transpose(x, (1, 0, 2))
        out.append(np.ascontiguousarray(x))
    return out


class SRDatasetDownsample:
    """On-the-fly LR generation from HR images (srdata.py:168-237).

    ``use_native``: decode/crop/resize through the C++ loader
    (tpu_diinn/native) when it built successfully — the host-side hot loop
    (3 bicubic downsamples per sample) runs outside the GIL. Falls back to
    the PIL/numpy path automatically; both produce identical samples.
    """

    def __init__(self, root: str = "./data/", name: str = "DIV2K",
                 split: str = "train", file_ext: str = ".png",
                 scales: Sequence[float] = (2,), patch_size: int = 96,
                 augment: bool = True, use_native: bool = True):
        self.scales = list(scales)
        self.patch_size = patch_size
        self.augment = augment
        # benchmark sets beyond the reference's four (any benchmark/<X>/HR
        # directory) follow the same layout convention
        layout = DATASET_DIR_STRUCTURE[name].get(split) \
            if name == "benchmark" else DATASET_DIR_STRUCTURE[name][split]
        if layout is None:
            layout = {"hr_dir": f"{split}/HR", "lr_dir": f"{split}/LR_bicubic"}
        hr_dir = Path(root) / name / layout["hr_dir"]
        self.names_hr = sorted(
            glob.glob(os.path.join(str(hr_dir), "*" + file_ext)))
        self._native = None
        if use_native:
            try:
                from tpu_diinn.native import loader as native_loader
                if native_loader.available():
                    self._native = native_loader
            except Exception:
                self._native = None

    def __len__(self) -> int:
        return len(self.names_hr)

    def get_patch(self, hr: np.ndarray, scale: float,
                  rng: np.random.Generator
                  ) -> Tuple[np.ndarray, np.ndarray]:
        if self.patch_size == 0:
            size = resize_by_scale_size(hr.shape[:2], scale)
            lr = resize_np(hr.astype(np.float32), size)
            return lr, hr.astype(np.float32)
        ps = self.patch_size
        hps = int(round(ps * scale))
        top = int(rng.integers(0, hr.shape[0] - hps + 1))
        left = int(rng.integers(0, hr.shape[1] - hps + 1))
        crop = hr[top:top + hps, left:left + hps].astype(np.float32)
        lr = resize_np(crop, (ps, ps))
        return lr, crop

    def sample(self, idx: int, rng: np.random.Generator) -> Sample:
        path = self.names_hr[idx]
        name = os.path.splitext(os.path.basename(path))[0]
        native = self._native
        hr_img = native.decode_image(path) if native else _read_image(path)
        out: Sample = {}
        for scale in self.scales:
            if native is not None and self.patch_size > 0:
                ps = self.patch_size
                hps = int(round(ps * scale))
                top = int(rng.integers(0, hr_img.shape[0] - hps + 1))
                left = int(rng.integers(0, hr_img.shape[1] - hps + 1))
                if self.augment:
                    hf, vf, df = (rng.random(3) < 0.5)
                else:
                    hf = vf = df = False
                lr, hr = native.sample_patch(hr_img, top, left, hps, ps,
                                             bool(hf), bool(vf), bool(df))
                out[scale] = (lr, hr, name)
                continue
            lr, hr = self.get_patch(hr_img, scale, rng)
            if self.augment:
                lr, hr = _augment([lr, hr], rng)
            out[scale] = (lr / 255.0, hr / 255.0, name)
        return out


class Subset:
    """Index-remapped view of a dataset (reference torch.utils.data.Subset,
    ``sr_datamodule.py:97-103``)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def sample(self, idx, rng):
        return self.dataset.sample(self.indices[idx], rng)


class ConcatDataset:
    """Sequential concatenation of datasets (reference
    torch ConcatDataset, ``sr_datamodule.py:106-108``)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def sample(self, idx, rng):
        k = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[k].sample(idx - int(self._offsets[k]), rng)


class SRDatasetPaired:
    """Pre-generated LR/HR pair loader (srdata.py:42-161). ``scales`` must be
    integers; LR files follow ``LR_bicubic/X{s}/{name}x{s}{ext}``.

    ``binarize=True`` caches each decoded image as ``.npy`` under
    ``<root>/<name>/bin/`` the first time it is read (the reference's pickle
    binarization cache, ``srdata.py:61-77,134-138``) — later epochs skip the
    PNG decode entirely."""

    def __init__(self, root: str = "./data/", name: str = "DIV2K",
                 split: str = "train", file_ext: str = ".png",
                 scales: Sequence[int] = (2,), patch_size: int = 96,
                 augment: bool = True, binarize: bool = False):
        self.scales = list(scales)
        self.patch_size = patch_size
        self.augment = augment
        base = Path(root) / name
        struct = DATASET_DIR_STRUCTURE[name][split]
        self.hr_dir = base / struct["hr_dir"]
        self.lr_dir = base / struct["lr_dir"]
        self.file_ext = file_ext
        self.names_hr = sorted(
            glob.glob(os.path.join(str(self.hr_dir), "*" + file_ext)))
        self.bin_dir = (base / "bin") if binarize else None
        if self.bin_dir is not None:
            self.bin_dir.mkdir(parents=True, exist_ok=True)

    def _read(self, path: str) -> np.ndarray:
        if self.bin_dir is None:
            return _read_image(path)
        rel = os.path.relpath(path, self.bin_dir.parent)
        cached = self.bin_dir / (rel.replace(os.sep, "__") + ".npy")
        if cached.exists():
            return np.load(cached)
        img = _read_image(path)
        tmp = cached.with_suffix(".tmp.npy")
        np.save(tmp, img)
        os.replace(tmp, cached)
        return img

    def __len__(self) -> int:
        return len(self.names_hr)

    def _lr_path(self, hr_path: str, scale: int) -> str:
        stem = os.path.splitext(os.path.basename(hr_path))[0]
        return str(self.lr_dir / f"X{scale}" / f"{stem}x{scale}{self.file_ext}")

    def sample(self, idx: int, rng: np.random.Generator) -> Sample:
        path = self.names_hr[idx]
        name = os.path.splitext(os.path.basename(path))[0]
        hr_img = self._read(path).astype(np.float32)
        out: Sample = {}
        for scale in self.scales:
            lr_img = self._read(self._lr_path(path, scale)).astype(np.float32)
            if self.patch_size == 0:
                lh, lw = lr_img.shape[:2]
                hr_c = hr_img[: lh * scale, : lw * scale]
                lr_c = lr_img
            else:
                ps = self.patch_size
                top = int(rng.integers(0, lr_img.shape[0] - ps + 1))
                left = int(rng.integers(0, lr_img.shape[1] - ps + 1))
                lr_c = lr_img[top:top + ps, left:left + ps]
                hr_c = hr_img[top * scale:(top + ps) * scale,
                              left * scale:(left + ps) * scale]
            pair = [lr_c, hr_c]
            if self.augment:
                pair = _augment(pair, rng)
            out[scale] = (pair[0] / 255.0, pair[1] / 255.0, name)
        return out


class SyntheticSRDataset:
    """Deterministic random-image dataset (no files needed)."""

    def __init__(self, n_images: int = 16, image_size: int = 256,
                 scales: Sequence[float] = (2, 3, 4), patch_size: int = 48,
                 augment: bool = True, seed: int = 0):
        self.n = n_images
        self.image_size = image_size
        self.scales = list(scales)
        self.patch_size = patch_size
        self.augment = augment
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def _image(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        s = self.image_size
        # smooth-ish random image: low-res noise upsampled + fine noise
        base = rng.random((s // 8, s // 8, 3)).astype(np.float32)
        img = resize_np(base, (s, s))
        img = img + 0.1 * rng.standard_normal((s, s, 3)).astype(np.float32)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def sample(self, idx: int, rng: np.random.Generator) -> Sample:
        hr_img = self._image(idx)
        helper = SRDatasetDownsample.__new__(SRDatasetDownsample)
        helper.patch_size = self.patch_size
        out: Sample = {}
        for scale in self.scales:
            lr, hr = SRDatasetDownsample.get_patch(helper, hr_img, scale, rng)
            if self.augment:
                lr, hr = _augment([lr, hr], rng)
            out[scale] = (lr / 255.0, hr / 255.0, f"synthetic_{idx:04d}")
        return out
