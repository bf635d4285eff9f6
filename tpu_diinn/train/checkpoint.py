"""Orbax checkpointing with best-by-val-loss + last retention.

Equivalent of the reference's ModelCheckpoint callback configuration
(``configs/default.yaml:24-38``: monitor val/loss, save_top_k=1,
save_last=true, full training state) plus hyperparameter embedding so a
checkpoint alone rebuilds the exact net (``sr_module.py:91``,
``benchmarks.py:17``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_loss = np.inf
        best_meta = self.dir / "best" / "meta.json"
        if best_meta.exists():
            self.best_loss = json.loads(best_meta.read_text())["val_loss"]

    def _save(self, tag: str, state: Any, meta: dict) -> None:
        path = self.dir / tag
        tmp = self.dir / f"{tag}.tmp"
        if tmp.exists():
            import shutil
            shutil.rmtree(tmp)
        self._ckpt.save(tmp / "state", state)
        self._ckpt.wait_until_finished()
        (tmp / "meta.json").write_text(json.dumps(meta))
        if path.exists():
            import shutil
            shutil.rmtree(path)
        tmp.rename(path)

    def save(self, state: Any, *, step: int, val_loss: float,
             config: dict, epoch: int = -1) -> None:
        meta = {"step": step, "epoch": int(epoch),
                "val_loss": float(val_loss), "config": config}
        self._save("last", state, meta)
        if val_loss < self.best_loss:
            self.best_loss = float(val_loss)
            self._save("best", state, meta)

    def restore(self, tag: str = "last",
                target: Optional[Any] = None) -> Tuple[Any, dict]:
        path = self.dir / tag
        meta = json.loads((path / "meta.json").read_text())
        if target is not None:
            state = self._ckpt.restore(path / "state", target)
        else:
            state = self._ckpt.restore(path / "state")
        return state, meta


def load_params(ckpt_path: str, tag: str = "best") -> Tuple[Any, dict]:
    """Load {params, ...} state + config metadata from a checkpoint dir.

    Accepts the manager directory, a direct best/last subdir, or a compact
    ``.npz`` weights export (see :func:`export_params_npz`).
    """
    p = Path(ckpt_path)
    if p.suffix == ".npz":
        return load_params_npz(str(p))
    if (p / "meta.json").exists():
        meta = json.loads((p / "meta.json").read_text())
        state = ocp.StandardCheckpointer().restore(p / "state")
        return state, meta
    return CheckpointManager(str(p)).restore(tag)


# ---------------------------------------------------------------------------
# Compact weights export: a single .npz with bf16-packed float params.
#
# Orbax checkpoint dirs hold the full train state (params + Adam moments,
# ~3x params, thousands of files) and live outside version control; the
# export is a small, committable artifact that `load_params` (and therefore
# the benchmarks/demo CLIs) accepts directly. Float arrays are stored as
# uint16 views of bf16 (weights are bf16 on the TPU compute path anyway);
# non-float (step counters etc.) are stored raw.
# ---------------------------------------------------------------------------

_BF16 = "bf16:"


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
        return out
    out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def export_params_npz(ckpt_path: str, out_path: str,
                      tag: str = "best") -> dict:
    """Write the checkpoint's params (bf16-packed) + meta to ``out_path``."""
    import ml_dtypes

    state, meta = load_params(ckpt_path, tag)
    params = state["params"] if isinstance(state, dict) and "params" in state \
        else state
    payload = {}
    for key, arr in _flatten(params).items():
        # np.issubdtype misses ml_dtypes floats (bfloat16 etc.): those must
        # also go through the bf16 pack, or numpy would pickle the custom
        # dtype and load_params_npz (allow_pickle=False) couldn't read it.
        if (np.issubdtype(arr.dtype, np.floating)
                or arr.dtype == ml_dtypes.bfloat16):
            payload[_BF16 + key] = arr.astype(ml_dtypes.bfloat16).view(
                np.uint16)
        else:
            payload[key] = arr
    slim = {k: meta[k] for k in ("step", "epoch", "val_loss", "config")
            if k in meta}
    np.savez_compressed(out_path, __meta__=np.str_(json.dumps(slim)),
                        **payload)
    return slim


def load_params_npz(path: str) -> Tuple[Any, dict]:
    """Load a compact export as ({"params": tree}, meta) — float params come
    back fp32 (bf16-rounded)."""
    import ml_dtypes

    z = np.load(path)
    meta = json.loads(str(z["__meta__"]))
    flat = {}
    for key in z.files:
        if key == "__meta__":
            continue
        if key.startswith(_BF16):
            flat[key[len(_BF16):]] = z[key].view(
                ml_dtypes.bfloat16).astype(np.float32)
        else:
            flat[key] = z[key]
    return {"params": _unflatten(flat)}, meta
