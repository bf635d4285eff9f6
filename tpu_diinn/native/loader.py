"""ctypes bindings for the native C++ data-loader (native/loader.cc).

Builds lazily with g++ on first use (libpng/libjpeg/zlib + std::thread);
falls back cleanly when the toolchain or libs are absent — callers check
``available()``. All ctypes calls release the GIL, so both the internal
std::thread batch API and Python-side thread pools parallelize for real.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "loader.cc"
_BUILD_DIR = _ROOT / "build"
_SO = _BUILD_DIR / "libtpudiinn_loader.so"

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_SO), "-lpng", "-ljpeg", "-lz", "-pthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(str(_SO))
        lib.image_size.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
        lib.image_size.restype = ctypes.c_int
        lib.decode_image.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int, ctypes.c_int]
        lib.decode_image.restype = ctypes.c_int
        lib.resize_bicubic_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.sample_patch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.sample_patch.restype = ctypes.c_int
        lib.sample_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.sample_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_size(path: str) -> Tuple[int, int]:
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"cannot decode {path}")
    return h.value, w.value


def decode_image(path: str) -> np.ndarray:
    lib = _load()
    h, w = image_size(path)
    out = np.empty((h, w, 3), np.uint8)
    if lib.decode_image(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        h, w):
        raise IOError(f"cannot decode {path}")
    return out


def resize_bicubic(img: np.ndarray, size: Tuple[int, int],
                   antialias: bool = True) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((size[0], size[1], c), np.float32)
    lib.resize_bicubic_f32(_fptr(img), h, w, c, _fptr(out), size[0], size[1],
                           1 if antialias else 0)
    return out


def sample_patch(img: np.ndarray, top: int, left: int, hps: int, ps: int,
                 hflip: bool, vflip: bool, dflip: bool
                 ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    lr = np.empty((ps, ps, 3), np.float32)
    hr = np.empty((hps, hps, 3), np.float32)
    rc = lib.sample_patch(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        top, left, hps, ps, int(hflip), int(vflip), int(dflip),
        _fptr(lr), _fptr(hr))
    if rc:
        raise ValueError("sample_patch failed (crop out of range?)")
    return lr, hr


def sample_batch(paths: Sequence[str], tops, lefts, hps: int, ps: int,
                 hflips, vflips, dflips, n_threads: int = 8
                 ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ia = lambda v: np.ascontiguousarray(v, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int))
    lr = np.empty((n, ps, ps, 3), np.float32)
    hr = np.empty((n, hps, hps, 3), np.float32)
    failed = lib.sample_batch(c_paths, n, ia(tops), ia(lefts), hps, ps,
                              ia(hflips), ia(vflips), ia(dflips),
                              _fptr(lr), _fptr(hr), n_threads)
    if failed:
        raise IOError(f"{failed}/{n} samples failed to load")
    return lr, hr
