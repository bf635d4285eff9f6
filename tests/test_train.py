"""Training-harness tests: config, data pipeline, train step, overfit sanity,
checkpoint round-trip. All on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_diinn.config.config import Config, load_config
from tpu_diinn.data.datasets import SyntheticSRDataset
from tpu_diinn.data import pipeline
from tpu_diinn.train import loop
from tpu_diinn.train.optim import make_optimizer
from tpu_diinn.parallel.mesh import make_mesh


def tiny_config(tmpdir="/tmp/tpu_diinn_test_ckpt") -> Config:
    cfg = load_config(overrides=[
        "model.encoder=edsr-baseline-tiny",
        "model.hidden_dims=[32,32]",
        "data.synthetic=true",
        "data.batch_size=8",
        "data.patch_size=16",
        "data.train_scales=[2,3]",
        "data.trainsets_repeat=1",
        "trainer.max_epochs=1",
        f"trainer.ckpt_dir={tmpdir}",
    ])
    return cfg


def test_config_yaml_and_overrides(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("model:\n  arch: liif\ndata:\n  batch_size: 2\n")
    cfg = load_config(str(y), ["model.mode=4", "data.train_scales=[2,2.5]",
                               "trainer.donate=false"])
    assert cfg.model.arch == "liif" and cfg.model.mode == 4
    assert cfg.data.batch_size == 2
    assert cfg.data.train_scales == [2, 2.5]
    assert cfg.trainer.donate is False
    y2 = tmp_path / "bad.yaml"
    y2.write_text("model:\n  nonexistent_key: 1\n")
    with pytest.raises(KeyError):
        load_config(str(y2))


def test_pipeline_batches_are_deterministic_and_static_shaped():
    d = SyntheticSRDataset(n_images=4, scales=(2, 3), patch_size=16, seed=1)
    b1 = list(pipeline.train_batches(d, batch_size=4, epoch=0, seed=9,
                                     repeat=2, num_workers=2))
    b2 = list(pipeline.train_batches(d, batch_size=4, epoch=0, seed=9,
                                     repeat=2, num_workers=4))
    assert len(b1) == len(b2) == 2
    for x, y in zip(b1, b2):
        for s in x:
            np.testing.assert_array_equal(x[s][0], y[s][0])
    assert b1[0][2][0].shape == (4, 16, 16, 3)
    assert b1[0][2][1].shape == (4, 32, 32, 3)
    assert b1[0][3][1].shape == (4, 48, 48, 3)
    # different epoch -> different order/content
    b3 = list(pipeline.train_batches(d, batch_size=4, epoch=1, seed=9,
                                     repeat=2, num_workers=2))
    assert not np.allclose(b1[0][2][0], b3[0][2][0])


def test_pipeline_sharding_partitions_indices():
    d = SyntheticSRDataset(n_images=4, scales=(2,), patch_size=8, seed=1)
    full = list(pipeline.train_batches(d, batch_size=2, epoch=0, seed=9,
                                       repeat=2, num_workers=1))
    sh0 = list(pipeline.train_batches(d, batch_size=1, epoch=0, seed=9,
                                      repeat=2, num_workers=1,
                                      shard_index=0, num_shards=2))
    sh1 = list(pipeline.train_batches(d, batch_size=1, epoch=0, seed=9,
                                      repeat=2, num_workers=1,
                                      shard_index=1, num_shards=2))
    assert len(sh0) == len(sh1) == 4
    total = sum(len(b) for b in (sh0 + sh1))
    assert total == 8


def test_train_smoke_loss_decreases():
    cfg = tiny_config()
    state = loop.train(cfg, max_steps=1, log_fn=lambda *a: None)
    task = loop.build_task(cfg)
    d = SyntheticSRDataset(n_images=4, scales=(2,), patch_size=16, seed=3,
                           augment=False)
    batch = next(pipeline.train_batches(d, batch_size=4, epoch=0, seed=1,
                                        num_workers=1))
    pure = {s: (jnp.asarray(lr), jnp.asarray(hr))
            for s, (lr, hr) in batch.items()}
    tx = make_optimizer(1e-3, 10)
    state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
    step = loop.make_train_step(task, tx, mesh=None)
    first = None
    for i in range(80):
        state, m = step(state, pure)
        if first is None:
            first = float(m["loss"])
    # overfit-one-batch sanity: loss must drop substantially
    assert float(m["loss"]) < 0.45 * first, (first, float(m["loss"]))


def test_train_step_on_8_device_mesh():
    cfg = tiny_config()
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    task = loop.build_task(cfg)
    tx = make_optimizer(1e-3, 10)
    state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
    d = SyntheticSRDataset(n_images=8, scales=(2, 3), patch_size=16, seed=3)
    batch = next(pipeline.train_batches(d, batch_size=8, epoch=0, seed=1,
                                        num_workers=1))
    placed = loop.shard_batch({s: (lr, hr) for s, (lr, hr) in batch.items()},
                              mesh)
    step = loop.make_train_step(task, tx, mesh=mesh)
    state2, m = step(state, placed)
    assert np.isfinite(float(m["loss"]))
    # params remain replicated and identical to a single-device run
    state_1dev = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
    step1 = loop.make_train_step(task, tx, mesh=None)
    pure = {s: (jnp.asarray(lr), jnp.asarray(hr))
            for s, (lr, hr) in batch.items()}
    state1_after, m1 = step1(state_1dev, pure)
    assert abs(float(m["loss"]) - float(m1["loss"])) < 1e-5
    l2 = jax.tree.leaves(state2.params)
    l1 = jax.tree.leaves(state1_after.params)
    for a, b in zip(l2, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_checkpoint_roundtrip(tmp_path):
    from tpu_diinn.train.checkpoint import CheckpointManager, load_params
    cfg = tiny_config(str(tmp_path / "ck"))
    tx = make_optimizer(1e-3, 10)
    state = loop.init_state(cfg, tx, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, step=5, val_loss=0.5, config={"a": 1})
    mgr.save(state, step=6, val_loss=0.7, config={"a": 1})  # worse: last only
    restored, meta = mgr.restore("last", target=state)
    assert meta["step"] == 6
    best, bmeta = mgr.restore("best", target=state)
    assert bmeta["step"] == 5 and bmeta["val_loss"] == 0.5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state2, meta2 = load_params(str(tmp_path / "ck"), "best")
    assert meta2["step"] == 5
