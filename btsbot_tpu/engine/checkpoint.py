"""Checkpointing with full training resume.

The reference checkpoints only model weights (``torch.save(state_dict)`` of
latest/best each epoch, train.py:314-317,337-340) — optimizer/scheduler/epoch
state is lost and there is NO resume (SURVEY.md §5).  Here the full
TrainState (params, batch stats, optimizer state, step counter, RNG) plus
loop metadata (epoch, history, early-stop counters) round-trips through
orbax, and "best model" params are additionally saved standalone for
serving/export.

Layout of a model dir (reference-compatible where it overlaps):
    <model_dir>/report.json          — training report (metrics.report)
    <model_dir>/best/                — best-model params+batch_stats (orbax)
    <model_dir>/latest/              — full TrainState + loop metadata
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_saveable(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }


def save_train_state(ckpt_dir: str, state: TrainState, extra: dict) -> None:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_saveable(state), force=True)
    with open(os.path.join(path, "loop_meta.json"), "w") as f:
        json.dump(extra, f, default=lambda x: np.asarray(x).tolist())


def restore_train_state(ckpt_dir: str, template: TrainState
                        ) -> tuple[TrainState, dict]:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=_to_saveable(template))
    state = template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        rng=jax.random.wrap_key_data(restored["rng"]),
    )
    with open(os.path.join(path, "loop_meta.json"), "r") as f:
        extra = json.load(f)
    return state, extra


def save_model_variables(ckpt_dir: str, params: Any, batch_stats: Any) -> None:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "batch_stats": batch_stats},
                   force=True)


def load_model_variables(ckpt_dir: str, template: dict | None = None) -> dict:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return variables
