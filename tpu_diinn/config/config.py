"""Configuration: dataclass tree + YAML + dotted CLI overrides.

TPU-native replacement for the reference's LightningCLI/omegaconf stack
(``train.py:9``, ``configs/default.yaml``): a typed dataclass tree with the
same defaults, loadable from YAML and overridable with ``--a.b.c=value``
arguments (``README.md:108`` style). Single seed drives one jax PRNG
(reference ``seed_everything: 123``, default.yaml:1).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import yaml


@dataclass
class ModelConfig:
    arch: str = "diinn"             # diinn | liif | metasr | bicubic
    mode: int = 3                   # DIINN interaction mode (README.md:108)
    init_q: bool = False
    encoder: str = "rdn"            # encoder spec (nn/registry.py)
    hidden_dims: Optional[List[int]] = None
    lr: float = 1e-4                # sr_module.py:81
    lr_gamma: float = 0.5           # sr_module.py:82
    lr_step: int = 10               # sr_module.py:83 (epochs)
    eval_bsize: int = 30000         # sr_module.py:85
    dtype: str = "float32"          # compute dtype: float32 | bfloat16
    use_fused: Optional[bool] = None  # fused Pallas decode (None = auto/TPU)
    lane_pack: Optional[bool] = None  # packed encoder convs (None = auto/TPU)


@dataclass
class DataConfig:
    root: str = "./data/"
    trainsets: List[Tuple[str, str]] = field(
        default_factory=lambda: [("DIV2K", "train")])
    trainsets_repeat: int = 20      # default.yaml:101
    testsets: List[Tuple[str, str]] = field(default_factory=lambda: [
        ("DIV2K", "train"), ("benchmark", "B100"), ("benchmark", "Set5"),
        ("benchmark", "Set14"), ("benchmark", "Urban100")])
    batch_size: int = 4             # default.yaml:114 (global batch)
    train_scales: List[float] = field(default_factory=lambda: [2, 3, 4])
    test_scales: List[float] = field(
        default_factory=lambda: [2, 2.5, 3, 3.5, 4, 6, 8, 10, 15, 20])
    patch_size: int = 48            # default.yaml:130
    num_workers: int = 8            # host-side prefetch threads
    synthetic: bool = False         # random-image dataset for smoke runs


@dataclass
class TrainerConfig:
    max_epochs: int = 50            # default.yaml:58
    check_val_every_n_epoch: int = 1
    log_every_n_steps: int = 50
    ckpt_dir: str = "./checkpoints"
    log_dir: Optional[str] = None     # JSONL metrics (train/logging.py)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    profile_steps: int = 5            # steps to trace when profile_dir set
    debug_nans: bool = False          # reference detect_anomaly equivalent
    resume: Optional[str] = None
    limit_val_images: Optional[int] = None  # None = full val set
    mesh_data: int = -1             # data-parallel axis size (-1 = all devices)
    mesh_space: int = 1             # query/space-parallel axis size
    donate: bool = True


@dataclass
class Config:
    seed: int = 123                 # default.yaml:1
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)


def _set_dotted(obj: Any, dotted: str, value: str) -> None:
    parts = dotted.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    name = parts[-1]
    current = getattr(obj, name)
    setattr(obj, name, _coerce(value, current))


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, (list, tuple)) or current is None:
        try:
            return yaml.safe_load(value)
        except yaml.YAMLError:
            return value
    return value


def _merge(dc: Any, tree: dict) -> None:
    for k, v in tree.items():
        if not hasattr(dc, k):
            raise KeyError(f"unknown config key: {k}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge(cur, v)
        else:
            setattr(dc, k, v)


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from defaults + optional YAML + ``a.b=c`` overrides."""
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as f:
            tree = yaml.safe_load(f) or {}
        _merge(cfg, tree)
    for ov in overrides or []:
        ov = ov.lstrip("-")
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, _, val = ov.partition("=")
        _set_dotted(cfg, key, val)
    return cfg


def to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)
