"""Training/eval loops: jitted multi-scale train step, epoch driver, eval.

Equivalent of the reference Trainer.fit/test flow (SURVEY.md §3.1-3.2) in
plain JAX: one jitted ``train_step`` (params+opt donated) consuming a
multi-scale batch, StepLR-by-epoch schedule baked into the optax schedule,
validation with chunked decode + div2k-protocol PSNR each epoch, orbax
best+last checkpoints, and a benchmark-style test loop producing
psnr/ssim/lr_psnr per scale (``sr_module.py:113-180``).

Data-parallel by construction: batches are placed with a batch-axis
NamedSharding over the mesh's 'data' axis and the step is jitted with
replicated params, so XLA inserts the gradient all-reduce (psum) and
overlaps it with the backward pass. Single-chip is the 1-device mesh.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import flax
import optax

from tpu_diinn.config.config import Config, to_dict
from tpu_diinn.data import datasets as ds
from tpu_diinn.data import pipeline
from tpu_diinn.nn.registry import make_net
from tpu_diinn.train import metrics as M
from tpu_diinn.train.checkpoint import CheckpointManager
from tpu_diinn.train.optim import make_optimizer
from tpu_diinn.train.task import SRTask
from tpu_diinn.parallel.mesh import make_mesh


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_task(cfg: Config) -> SRTask:
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else None
    net = make_net(m.arch, mode=m.mode, init_q=m.init_q,
                   encoder_spec=m.encoder, dtype=dtype,
                   hidden_dims=m.hidden_dims, use_fused=m.use_fused,
                   lane_pack=m.lane_pack)
    return SRTask(net=net, eval_bsize=m.eval_bsize)


def init_state(cfg: Config, tx: optax.GradientTransformation,
               rng: jax.Array) -> TrainState:
    task = build_task(cfg)
    ps = max(cfg.data.patch_size, 8)
    dummy = jnp.zeros((1, ps, ps, 3), jnp.float32)
    params = task.net.init(rng, dummy, (ps * 2, ps * 2))
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(task: SRTask, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Returns a jitted (state, batch) -> (state, metrics) step."""

    constrain = None
    if mesh is not None and mesh.shape.get("space", 1) > 1:
        from tpu_diinn.parallel.sharding import shard_queries
        constrain = lambda t: shard_queries(t, mesh)

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            loss, _ = task.loss_and_preds(params, batch,
                                          constrain=constrain)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm})

    kwargs = {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # state and metrics replicated; batches pre-placed on the data axis
        # by shard_batch, in_shardings inferred from operands.
        kwargs["out_shardings"] = (repl, repl)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else (), **kwargs)


def shard_batch(batch: Dict[float, Tuple[np.ndarray, np.ndarray]],
                mesh: Optional[Mesh]):
    """Place a numpy batch on device, batch axis over the 'data' mesh axis.

    Multi-host: each process holds only its shard of the global batch
    (``pipeline.train_batches(shard_index=process_index)``), assembled into
    one global array via ``make_array_from_process_local_data`` — the
    jax-native equivalent of DDP's per-rank DataLoader feed
    (``sr_datamodule.py:137-144``)."""
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), batch)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


Subset = ds.Subset


def _build_set(cfg: Config, name: str, split: str, *, scales, patch_size: int,
               augment: bool):
    """One dataset from a (name, split) config entry.

    DIV2K's 900 train images are partitioned reference-style: ``train`` =
    [0:800], ``val``/``test`` = [800:900] (``sr_datamodule.py:97-103,
    130-135``). Benchmark sets are used whole. The split range adapts to
    however many images are actually on disk (8/9ths train, the rest val)
    so reduced local copies keep a disjoint train/val divide."""
    if name == "DIV2K":
        full = ds.SRDatasetDownsample(root=cfg.data.root, name="DIV2K",
                                      split="train", scales=scales,
                                      patch_size=patch_size, augment=augment)
        n = len(full)
        cut = 800 if n >= 900 else (n * 8) // 9
        rng = range(0, cut) if split == "train" else range(cut, n)
        return ds.Subset(full, rng)
    return ds.SRDatasetDownsample(root=cfg.data.root, name=name, split=split,
                                  scales=scales, patch_size=patch_size,
                                  augment=augment)


def make_datasets(cfg: Config):
    """Train/val assembly from ``cfg.data.trainsets``
    (reference ``sr_datamodule.py:85-135``)."""
    d = cfg.data
    if d.synthetic:
        train = ds.SyntheticSRDataset(n_images=16, scales=d.train_scales,
                                      patch_size=d.patch_size, seed=cfg.seed)
        val = ds.SyntheticSRDataset(n_images=2, scales=d.train_scales,
                                    patch_size=0, augment=False,
                                    seed=cfg.seed + 1, image_size=96)
        return train, val
    trains = [_build_set(cfg, name, split, scales=d.train_scales,
                         patch_size=d.patch_size, augment=True)
              for name, split in d.trainsets]
    train = trains[0] if len(trains) == 1 else ds.ConcatDataset(trains)
    # val = the held-out tail of the first trainset, full images
    # (sr_datamodule.py:130-135: DIV2K[800:900]).
    val_name, _ = d.trainsets[0]
    val = _build_set(cfg, val_name, "val", scales=d.train_scales,
                     patch_size=0, augment=False)
    return train, val


def make_test_datasets(cfg: Config) -> Dict[str, Any]:
    """Test assembly from ``cfg.data.testsets`` at ``test_scales``
    (reference ``sr_datamodule.py:110-135,155-162``: DIV2K val + benchmark
    sets wired into the same run). Entries: ("DIV2K", "train") means the
    DIV2K val tail; ("benchmark", <SetName>) a benchmark set."""
    out: Dict[str, Any] = {}
    for name, split in cfg.data.testsets:
        key = split if name == "benchmark" else name
        dset = _build_set(cfg, name, "val" if name == "DIV2K" else split,
                          scales=cfg.data.test_scales, patch_size=0,
                          augment=False)
        out[key] = dset
    return out


class WeightedMean:
    """Batch-size-weighted epoch mean, matching Lightning's
    ``self.log(..., batch_size=B, sync_dist=True)`` epoch aggregation
    (``sr_module.py:130,146,153``): epoch value = sum(v_i * B_i) / sum(B_i).
    With constant batch sizes (train drop_last, batch-1 eval) this equals
    the plain mean; it differs exactly when batch sizes vary."""

    def __init__(self):
        self.num = 0.0
        self.den = 0.0

    def update(self, value: float, weight: float = 1.0) -> None:
        self.num += float(value) * float(weight)
        self.den += float(weight)

    def compute(self) -> float:
        return self.num / self.den if self.den else float("nan")


class EvalJit:
    """Per-(scale, image-shape) jitted eval functions, cached for a run.

    Eval must NOT run op-by-op: on the tunneled TPU platform every eager op
    is a remote dispatch, making an un-jitted full-image chunked decode
    minutes per image. Each distinct (scale, lr shape, hr shape) gets one
    jitted program (loss/PSNR for val; PSNR/SSIM/LR-PSNR for test) — on
    fixed-size val sets that is one compile per scale, reused every epoch,
    and it lands in the persistent XLA compile cache across runs."""

    def __init__(self, task: SRTask):
        self.task = task
        self._cache: Dict[Any, Any] = {}

    def val_fn(self, scale, lr_shape, hr_shape):
        key = ("val", scale, tuple(lr_shape), tuple(hr_shape))
        if key not in self._cache:
            task = self.task

            def f(params, lr, hr):
                loss, preds = task.loss_and_preds(
                    params, {scale: (lr, hr)}, bsize=task.eval_bsize)
                p = M.calc_psnr(preds[scale], hr, dataset="div2k",
                                scale=scale)
                return loss, p

            self._cache[key] = jax.jit(f)
        return self._cache[key]

    def test_fn(self, scale, lr_shape, hr_shape):
        key = ("test", scale, tuple(lr_shape), tuple(hr_shape))
        if key not in self._cache:
            task = self.task
            size = (hr_shape[1], hr_shape[2])

            def f(params, lr, hr):
                pred = task.predict(params, lr, size)
                return (M.psnr(pred, hr), M.ssim(pred, hr),
                        M.lr_psnr(pred, hr, scale))

            self._cache[key] = jax.jit(f)
        return self._cache[key]


def validate(task: SRTask, params, val_dataset, cfg: Config,
             max_images: Optional[int] = None,
             jit_cache: Optional[EvalJit] = None) -> Dict[str, float]:
    """Full-image val loop: loss + div2k-protocol PSNR per scale
    (sr_module.py:143-154). ``max_images=None`` = the full val set,
    matching the reference's 100-image DIV2K val protocol. Per-scale
    losses are averaged per image, matching the reference's multi-scale
    ``step`` loss (sr_module.py:113-125)."""
    ev = jit_cache or EvalJit(task)
    losses, psnrs = WeightedMean(), {}
    n = len(val_dataset) if max_images is None else min(max_images,
                                                        len(val_dataset))
    for _, batch in pipeline.eval_batches(val_dataset, seed=cfg.seed,
                                          indices=range(n)):
        img_loss, n_scales = 0.0, 0
        bs = 1
        for s, (lr, hr, _name) in batch.items():
            lr, hr = jnp.asarray(lr), jnp.asarray(hr)
            bs = lr.shape[0]
            loss, p = ev.val_fn(s, lr.shape, hr.shape)(params, lr, hr)
            img_loss += float(loss)
            n_scales += 1
            psnrs.setdefault(s, WeightedMean()).update(float(p), bs)
        losses.update(img_loss / max(n_scales, 1), bs)
    out = {"val_loss": losses.compute()}
    for s, wm in psnrs.items():
        out[f"val_psnr_x{s:g}"] = wm.compute()
    return out


def test_metrics(task: SRTask, params, dataset, cfg: Config,
                 max_images: Optional[int] = None,
                 jit_cache: Optional[EvalJit] = None) -> Dict[str, float]:
    """Benchmark test loop: psnr/ssim/lr_psnr per scale
    (sr_module.py:159-180)."""
    ev = jit_cache or EvalJit(task)
    acc: Dict[str, WeightedMean] = {}
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for _, batch in pipeline.eval_batches(dataset, seed=cfg.seed,
                                          indices=range(n)):
        for s, (lr, hr, _name) in batch.items():
            lr, hr = jnp.asarray(lr), jnp.asarray(hr)
            bs = lr.shape[0]
            p, ss, lp = ev.test_fn(s, lr.shape, hr.shape)(params, lr, hr)
            acc.setdefault(f"test_psnr_x{s:g}", WeightedMean()).update(
                float(p), bs)
            acc.setdefault(f"test_ssim_x{s:g}", WeightedMean()).update(
                float(ss), bs)
            acc.setdefault(f"test_lr_psnr_x{s:g}", WeightedMean()).update(
                float(lp), bs)
    return {k: wm.compute() for k, wm in acc.items()}


def train(cfg: Config, *, max_steps: Optional[int] = None,
          log_fn=None) -> TrainState:
    """Full training driver (reference Trainer.fit, SURVEY.md §3.1)."""
    from tpu_diinn.train.logging import MetricsLogger
    from tpu_diinn.train import profiling
    if cfg.trainer.debug_nans:
        profiling.enable_debug_nans(True)
    logger = MetricsLogger(cfg.trainer.log_dir, stdout=log_fn is None)
    if log_fn is None:
        log_fn = print
    mesh = make_mesh(cfg.trainer.mesh_data, cfg.trainer.mesh_space)
    d = cfg.data
    train_ds, val_ds = make_datasets(cfg)
    # multi-host: each process loads a disjoint slice of every global batch
    # (DDP per-rank DataLoader equivalent, sr_datamodule.py:137-144)
    num_shards = jax.process_count()
    shard_index = jax.process_index()
    if d.batch_size % num_shards:
        raise ValueError(f"batch_size {d.batch_size} must divide across "
                         f"{num_shards} processes")
    host_batch = d.batch_size // num_shards
    steps_per_epoch = max(1, (len(train_ds) * d.trainsets_repeat)
                          // d.batch_size)
    tx = make_optimizer(cfg.model.lr, steps_per_epoch, cfg.model.lr_step,
                        cfg.model.lr_gamma, cfg.trainer.max_epochs)
    task = build_task(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(cfg, tx, rng)
    # commit the fresh state to the mesh (replicated) BEFORE the first step:
    # an uncommitted state gives the first call a different arg signature
    # than the mesh-tagged state the step returns, so step 2 would silently
    # retrace and recompile the whole train step (minutes on a remote-
    # compiled TPU) — one signature means exactly one compile
    state = jax.device_put(state, NamedSharding(mesh, P()))
    ckpt = CheckpointManager(cfg.trainer.ckpt_dir)
    start_epoch = 0
    if cfg.trainer.resume:
        state, meta = CheckpointManager(cfg.trainer.resume).restore(
            "last", target=state)
        # resume the data order where the run left off: checkpoints are
        # written after the val at epoch end, so continue at epoch+1 and
        # stop at the SAME configured total (the LR schedule keys on the
        # restored step, so data order and schedule stay aligned)
        start_epoch = int(meta.get("epoch", -1)) + 1
        # restored arrays are committed to one device; re-place replicated
        # over the mesh before feeding the sharded step
        state = jax.device_put(state, NamedSharding(mesh, P()))
        log_fn(f"resumed from {cfg.trainer.resume} @ step {meta['step']}, "
               f"epoch {start_epoch}")
    step_fn = make_train_step(task, tx, mesh, donate=cfg.trainer.donate)

    # profile_dir: trace `profile_steps` steps, skipping 2 warmup/compile
    # steps (reference's unused `trainer.profiler` slot, default.yaml:79)
    profile_state = {"active": False, "stop_at": -1}
    first_step = int(state.step)

    def maybe_profile(step: int) -> None:
        if not cfg.trainer.profile_dir:
            return
        if (not profile_state["active"] and profile_state["stop_at"] < 0
                and step >= first_step + 2):
            jax.profiler.start_trace(cfg.trainer.profile_dir)
            profile_state["active"] = True
            profile_state["stop_at"] = step + cfg.trainer.profile_steps
        elif profile_state["active"] and step >= profile_state["stop_at"]:
            jax.profiler.stop_trace()
            profile_state["active"] = False

    global_step = int(state.step)
    eval_cache = EvalJit(task)
    t0 = time.time()
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        if max_steps is not None and global_step >= max_steps:
            break
        losses = []
        for batch in pipeline.train_batches(
                train_ds, batch_size=host_batch, epoch=epoch,
                seed=cfg.seed, repeat=d.trainsets_repeat,
                num_workers=d.num_workers,
                shard_index=shard_index, num_shards=num_shards):
            placed = shard_batch({s: (lr, hr) for s, (lr, hr) in
                                  batch.items()}, mesh)
            state, m = step_fn(state, placed)
            global_step += 1
            maybe_profile(global_step)
            losses.append(m["loss"])
            if global_step % cfg.trainer.log_every_n_steps == 0:
                logger.log(global_step, {"train_loss": float(m["loss"]),
                                         "grad_norm": float(m["grad_norm"])},
                           epoch=epoch)
            if max_steps is not None and global_step >= max_steps:
                break
        if (epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0:
            vm = validate(task, state.params, val_ds, cfg,
                          max_images=cfg.trainer.limit_val_images,
                          jit_cache=eval_cache)
            vm["train_loss"] = float(jnp.mean(jnp.stack(losses))) if losses \
                else float("nan")
            vm["steps_per_s"] = ((global_step - first_step)
                                 / max(time.time() - t0, 1e-9))
            logger.log(global_step, vm, epoch=epoch)
            ckpt.save(state, step=global_step, val_loss=vm["val_loss"],
                      config=to_dict(cfg), epoch=epoch)
    if profile_state["active"]:
        jax.profiler.stop_trace()
    logger.close()
    return state
