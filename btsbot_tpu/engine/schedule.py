"""Learning-rate schedule: linear warmup → cosine annealing.

Matches the reference's ``SequentialLR([LinearLR(start_factor=0.01),
CosineAnnealingLR(T_max=epochs−warmup, eta_min=lr·0.01)])`` stepped once per
epoch (`/root/reference/btsbot/train.py:249-260,332`): the LR is piecewise
constant within an epoch.
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_at_epoch(epoch, base_lr: float, total_epochs: int,
                warmup_epochs: int = 0, start_factor: float = 0.01,
                eta_min_factor: float = 0.01):
    """LR for a given (possibly traced) epoch index."""
    epoch = jnp.asarray(epoch, jnp.float32)
    warmup = jnp.float32(max(warmup_epochs, 0))
    # torch LinearLR factor after `epoch` steps (clamped at total_iters)
    t = jnp.minimum(epoch, jnp.maximum(warmup, 1.0))
    warm_factor = start_factor + (1.0 - start_factor) * t / jnp.maximum(warmup, 1.0)
    warm_lr = base_lr * warm_factor

    t_max = float(max(1, total_epochs - warmup_epochs))
    eta_min = base_lr * eta_min_factor
    cos_t = jnp.maximum(epoch - warmup, 0.0)
    cos_lr = eta_min + (base_lr - eta_min) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * cos_t / t_max))

    return jnp.where(epoch < warmup, warm_lr, cos_lr)


def make_lr_schedule(config, steps_per_epoch: int):
    """optax-style schedule over optimizer steps, stepping per epoch."""
    base_lr = float(config["learning_rate"])
    total_epochs = int(config["epochs"])
    warmup_epochs = int(config.get("warmup_epochs", 0))

    def schedule(step):
        epoch = jnp.asarray(step) // max(1, steps_per_epoch)
        return lr_at_epoch(epoch, base_lr, total_epochs, warmup_epochs)

    return schedule
