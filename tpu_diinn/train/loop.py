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
                   hidden_dims=m.hidden_dims, use_fused=m.use_fused)
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
        data_sh = NamedSharding(mesh, P("data"))
        kwargs["out_shardings"] = ((repl, repl, repl), repl)
        # in_shardings left to infer from operands (params replicated,
        # batches pre-placed on the data axis by shard_batch).
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def shard_batch(batch: Dict[float, Tuple[np.ndarray, np.ndarray]],
                mesh: Optional[Mesh]):
    """Place a numpy batch on device, batch axis over the 'data' mesh axis."""
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def make_datasets(cfg: Config):
    d = cfg.data
    if d.synthetic:
        train = ds.SyntheticSRDataset(n_images=16, scales=d.train_scales,
                                      patch_size=d.patch_size, seed=cfg.seed)
        val = ds.SyntheticSRDataset(n_images=2, scales=d.train_scales,
                                    patch_size=0, augment=False,
                                    seed=cfg.seed + 1, image_size=96)
        return train, val
    train = ds.SRDatasetDownsample(root=d.root, name="DIV2K", split="train",
                                   scales=d.train_scales,
                                   patch_size=d.patch_size, augment=True)
    val_full = ds.SRDatasetDownsample(root=d.root, name="DIV2K",
                                      split="train", scales=d.train_scales,
                                      patch_size=0, augment=False)
    # reference: train = DIV2K[0:800], val = DIV2K[800:900]
    # (sr_datamodule.py:97-103,130-135)
    train = Subset(train, range(0, min(800, len(train))))
    val = Subset(val_full, range(800, min(900, len(val_full))))
    return train, val


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def sample(self, idx, rng):
        return self.dataset.sample(self.indices[idx], rng)


def validate(task: SRTask, params, val_dataset, cfg: Config,
             max_images: Optional[int] = None) -> Dict[str, float]:
    """Full-image val loop: loss + div2k-protocol PSNR per scale
    (sr_module.py:143-154)."""
    losses, psnrs = [], {}
    n = len(val_dataset) if max_images is None else min(max_images,
                                                        len(val_dataset))
    for _, batch in pipeline.eval_batches(val_dataset, seed=cfg.seed,
                                          indices=range(n)):
        pure = {s: (jnp.asarray(lr), jnp.asarray(hr))
                for s, (lr, hr, _name) in batch.items()}
        loss, preds = task.loss_and_preds(params, pure,
                                          bsize=task.eval_bsize)
        losses.append(float(loss))
        for s, pred in preds.items():
            p = float(M.calc_psnr(pred, pure[s][1], dataset="div2k",
                                  scale=s))
            psnrs.setdefault(s, []).append(p)
    out = {"val_loss": float(np.mean(losses))}
    for s, vals in psnrs.items():
        out[f"val_psnr_x{s:g}"] = float(np.mean(vals))
    return out


def test_metrics(task: SRTask, params, dataset, cfg: Config,
                 max_images: Optional[int] = None) -> Dict[str, float]:
    """Benchmark test loop: psnr/ssim/lr_psnr per scale
    (sr_module.py:159-180)."""
    acc: Dict[str, list] = {}
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for _, batch in pipeline.eval_batches(dataset, seed=cfg.seed,
                                          indices=range(n)):
        for s, (lr, hr, _name) in batch.items():
            lr, hr = jnp.asarray(lr), jnp.asarray(hr)
            pred = task.predict(params, lr, hr.shape[1:3])
            acc.setdefault(f"test_psnr_x{s:g}", []).append(
                float(M.psnr(pred, hr)))
            acc.setdefault(f"test_ssim_x{s:g}", []).append(
                float(M.ssim(pred, hr)))
            acc.setdefault(f"test_lr_psnr_x{s:g}", []).append(
                float(M.lr_psnr(pred, hr, s)))
    return {k: float(np.mean(v)) for k, v in acc.items()}


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
    n_data = mesh.shape["data"]
    d = cfg.data
    train_ds, val_ds = make_datasets(cfg)
    steps_per_epoch = max(1, (len(train_ds) * d.trainsets_repeat)
                          // d.batch_size)
    tx = make_optimizer(cfg.model.lr, steps_per_epoch, cfg.model.lr_step,
                        cfg.model.lr_gamma, cfg.trainer.max_epochs)
    task = build_task(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(cfg, tx, rng)
    ckpt = CheckpointManager(cfg.trainer.ckpt_dir)
    if cfg.trainer.resume:
        state, meta = CheckpointManager(cfg.trainer.resume).restore(
            "last", target=state)
        log_fn(f"resumed from {cfg.trainer.resume} @ step {meta['step']}")
    step_fn = make_train_step(task, tx, mesh, donate=cfg.trainer.donate)

    global_step = int(state.step)
    t0 = time.time()
    for epoch in range(cfg.trainer.max_epochs):
        if max_steps is not None and global_step >= max_steps:
            break
        losses = []
        for batch in pipeline.train_batches(
                train_ds, batch_size=d.batch_size, epoch=epoch,
                seed=cfg.seed, repeat=d.trainsets_repeat,
                num_workers=d.num_workers):
            placed = shard_batch({s: (lr, hr) for s, (lr, hr) in
                                  batch.items()}, mesh)
            state, m = step_fn(state, placed)
            global_step += 1
            losses.append(m["loss"])
            if global_step % cfg.trainer.log_every_n_steps == 0:
                logger.log(global_step, {"train_loss": float(m["loss"]),
                                         "grad_norm": float(m["grad_norm"])},
                           epoch=epoch)
            if max_steps is not None and global_step >= max_steps:
                break
        if (epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0:
            vm = validate(task, state.params, val_ds, cfg, max_images=4)
            vm["train_loss"] = float(jnp.mean(jnp.stack(losses))) if losses \
                else float("nan")
            logger.log(global_step, vm, epoch=epoch)
            ckpt.save(state, step=global_step, val_loss=vm["val_loss"],
                      config=to_dict(cfg))
    logger.close()
    return state
