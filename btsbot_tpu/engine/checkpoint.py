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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_saveable(state: TrainState) -> dict:
    # opt_state is an optax NamedTuple tree whose structure cannot be
    # reconstructed from a bare checkpoint restore; store its leaves indexed
    # and unflatten against the live template's treedef on restore.
    opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_leaves": {str(i): leaf for i, leaf in enumerate(opt_leaves)},
        "rng": jax.random.key_data(state.rng),
    }


def save_train_state(ckpt_dir: str, state: TrainState, extra: dict) -> None:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_saveable(state), force=True)
    with open(os.path.join(path, "loop_meta.json"), "w") as f:
        json.dump(extra, f, default=lambda x: np.asarray(x).tolist())


def _restore_numpy(path: str) -> dict:
    """Restore a checkpoint tree as host numpy arrays.

    Restoring without explicit RestoreArgs resolves shardings from the file,
    which fails when the checkpoint was written on a different
    platform/topology (e.g. saved via the TPU relay, restored on CPU).
    Structure comes from the checkpoint's own metadata, so no template is
    needed.
    """
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(path, restore_args=restore_args)


def restore_train_state(ckpt_dir: str, template: TrainState
                        ) -> tuple[TrainState, dict]:
    path = os.path.abspath(ckpt_dir)
    restored = _restore_numpy(path)
    opt_leaves = [restored["opt_leaves"][str(i)]
                  for i in range(len(restored["opt_leaves"]))]
    treedef = jax.tree_util.tree_structure(template.opt_state)
    state = template.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree_util.tree_unflatten(treedef, opt_leaves),
        rng=jax.random.wrap_key_data(jnp.asarray(restored["rng"])),
    )
    with open(os.path.join(path, "loop_meta.json"), "r") as f:
        extra = json.load(f)
    return state, extra


def save_model_variables(ckpt_dir: str, params: Any, batch_stats: Any) -> None:
    path = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "batch_stats": batch_stats},
                   force=True)


def load_model_checkpoint(config, model_dir: str) -> dict:
    """Best-model variables from a model dir in EITHER convention:

    * this package's ``best/`` orbax checkpoint, or
    * the reference's ``best_model.pth`` torch state dict
      (train.py:337-340), converted strictly via interop.

    The shared loader behind frozen-fusion branch loading
    (models/fusion.py) and distillation teachers (engine/distill.py) — a
    reference-trained run dir works anywhere a btsbot_tpu one does.
    """
    orbax_dir = os.path.join(model_dir, "best")
    if os.path.isdir(orbax_dir):
        from ..models.factory import init_model

        _, template = init_model(config, rng=0)
        return load_model_variables(
            orbax_dir,
            template={"params": template["params"],
                      "batch_stats": template.get("batch_stats", {})})
    torch_path = os.path.join(model_dir, "best_model.pth")
    if os.path.isfile(torch_path):
        from ..interop.convert import torch_state_dict_to_variables
        from ..interop.hf import load_torch_checkpoint

        sd = load_torch_checkpoint(torch_path)
        return torch_state_dict_to_variables(config, sd)
    raise FileNotFoundError(
        f"No checkpoint (best/ or best_model.pth) in {model_dir}")


def load_model_variables(ckpt_dir: str, template: dict | None = None) -> dict:
    """Load a best/-style checkpoint.  ``template`` is accepted for API
    compatibility but the tree structure comes from the checkpoint itself
    (restore-with-template trips orbax sharding resolution on some
    platforms/relay setups)."""
    del template
    restored = _restore_numpy(os.path.abspath(ckpt_dir))
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return variables
