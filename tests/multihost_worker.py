"""One process of a multi-process jax.distributed CPU run.

Spawned by tests/test_multihost.py (NOT collected by pytest). Each process
owns 2 virtual CPU devices; together they form a 2-process x 2-device
global topology driving the REAL multi-host code path:
``maybe_init_distributed`` -> ``make_mesh`` over global devices ->
host-sharded ``pipeline.train_batches`` -> ``shard_batch``'s
``make_array_from_process_local_data`` branch -> jitted DP train step.

Usage: python tests/multihost_worker.py <proc_id> <nproc> <port> <outdir>
"""

import json
import os
import sys


CFG = [
    "model.arch=diinn", "model.encoder=rdn-tiny",
    "model.hidden_dims=[32,32]", "model.eval_bsize=997",
    "data.synthetic=true", "data.batch_size=4", "data.train_scales=[2]",
    "data.patch_size=16", "data.num_workers=2", "data.trainsets_repeat=1",
    "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=10",
    "trainer.donate=false",
]

N_STEPS = 2


def main():
    proc_id, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    extra = sys.argv[5:]              # extra config overrides from the test
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)
    os.environ["TPU_DIINN_PLATFORM"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from tpu_diinn.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    from tpu_diinn.config.config import load_config
    from tpu_diinn.train import loop

    losses = []
    cfg = load_config(None, CFG + extra + [
        f"trainer.ckpt_dir={out}/ckpt{proc_id}",
        f"trainer.log_dir={out}/log{proc_id}",
    ])
    state = loop.train(cfg, max_steps=N_STEPS,
                       log_fn=lambda *a: losses.append(a))

    if proc_id == 0:
        import numpy as np
        from tpu_diinn.train.checkpoint import _flatten
        flat = {k: np.asarray(v)
                for k, v in _flatten(jax.device_get(state.params)).items()}
        np.savez(os.path.join(out, "params0.npz"), **flat)
        with open(os.path.join(out, "done0.json"), "w") as f:
            json.dump({"step": int(state.step)}, f)


if __name__ == "__main__":
    main()
