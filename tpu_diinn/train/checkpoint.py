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

    Accepts either the manager directory or a direct best/last subdir.
    """
    p = Path(ckpt_path)
    if (p / "meta.json").exists():
        meta = json.loads((p / "meta.json").read_text())
        state = ocp.StandardCheckpointer().restore(p / "state")
        return state, meta
    return CheckpointManager(str(p)).restore(tag)
