"""Train state + optimizer construction.

Optimizer matches the reference exactly: AdamW with config betas and torch
defaults (eps 1e-8, decoupled weight decay 0.01 applied to every param,
including biases/norms — reference train.py:242-246), LR driven by the
warmup→cosine epoch schedule (engine.schedule).

``frozen_fusion`` freezes its two branches and trains only the combined head
(reference train.py:224-236); here that is an optimizer-level mask
(zero updates on the ``image_branch``/``meta_branch`` subtrees) so the jitted
train step stays uniform across model families.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray          # optimizer steps taken
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array             # base key; folded with step per batch


def make_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    from .schedule import make_lr_schedule

    schedule = make_lr_schedule(config, steps_per_epoch)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=float(config["beta_1"]),
        b2=float(config["beta_2"]),
        eps=1e-8,
        weight_decay=0.01,
    )

    if config["model_name"] == "frozen_fusion":
        def label(params):
            return {
                k: ("frozen" if k in ("image_branch", "meta_branch")
                    else "train")
                for k in params
            }
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx


def create_train_state(config, variables, tx, seed: int | None = None) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    rng = jax.random.key(seed if seed is not None
                         else int(config.get("random_seed", 0)))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=rng,
    )
