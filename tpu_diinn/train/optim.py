"""Optimizer: Adam + epoch-step decay schedule.

Reference: Adam(lr=1e-4) with StepLR(step_size=10 epochs, gamma=0.5)
(``src/models/sr_module.py:185-194``; defaults ``sr_module.py:81-84``).
Expressed as an optax chain with a piecewise-constant schedule keyed on the
global step, so it works identically under pjit across hosts.
"""

from __future__ import annotations

import optax


def step_decay_schedule(base_lr: float, steps_per_epoch: int,
                        lr_step_epochs: int = 10, lr_gamma: float = 0.5,
                        max_epochs: int = 50) -> optax.Schedule:
    boundaries = {
        e * steps_per_epoch: lr_gamma
        for e in range(lr_step_epochs, max_epochs + 1, lr_step_epochs)
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(base_lr: float = 1e-4, steps_per_epoch: int = 1,
                   lr_step_epochs: int = 10, lr_gamma: float = 0.5,
                   max_epochs: int = 50,
                   grad_clip: float | None = None) -> optax.GradientTransformation:
    sched = step_decay_schedule(base_lr, steps_per_epoch, lr_step_epochs,
                                lr_gamma, max_epochs)
    tx = [optax.scale_by_adam()]
    if grad_clip:
        tx.insert(0, optax.clip_by_global_norm(grad_clip))
    tx += [optax.scale_by_learning_rate(sched)]
    return optax.chain(*tx)
