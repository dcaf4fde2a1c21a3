"""End-to-end training engine.

The TPU-native replacement for the reference's ``run_training``
(`/root/reference/btsbot/train.py:75-478`).  Training semantics preserved:

* pos-weighted BCE with pos_weight = num_notbts/num_bts (train.py:211-212);
* AdamW(lr, betas) with torch defaults (train.py:242-246);
* linear-warmup → cosine LR stepped per epoch (train.py:249-260);
* on-device flip/rot augmentation per config flags (train.py:179-191);
* early stopping: save best when 1.005·val_loss < best-so-far, patience
  counter on non-improving epochs (train.py:334-353);
* best/latest checkpoints per epoch + report.json (train.py:314-340,439).

TPU-native differences: the whole step (aug+fwd+bwd+update) is one jitted
XLA program; batches are sharded over the mesh "data" axis (DataParallel
equivalent); validation reuses in-memory params (no per-epoch model reload
from disk, cf. val.py:68-69); checkpoints carry full optimizer state so
training is resumable (capability the reference lacks — SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import normalize_config
from ..data.dataset import (
    AlertDataset,
    apply_val_cuts,
    iterate_batches,
    load_split,
)
from ..metrics.diagnostics import diagnostic_summary
from ..metrics.report import make_report
from ..models.factory import init_model
from ..parallel.mesh import batch_sharding
from ..parallel.sharding import shard_variables
from .checkpoint import restore_train_state, save_model_variables, save_train_state
from .eval import evaluate
from .schedule import lr_at_epoch
from .state import create_train_state, make_optimizer
from .steps import make_train_step


def run_training(
    config,
    data_dir: str = "data",
    run_name: str = "run",
    out_root: str = "models",
    mesh=None,
    train_ds: AlertDataset | None = None,
    val_ds: AlertDataset | None = None,
    test_ds: AlertDataset | None = None,
    make_figure: bool = True,
    resume: bool = False,
    log: Callable[[str], None] = print,
    epoch_callback: Callable[[int, dict], None] | None = None,
    logger=None,
    initial_variables=None,
    teacher=None,
) -> dict[str, Any]:
    config = normalize_config(config)
    seed = int(config.get("random_seed", 0))

    # /---------------- data ----------------/
    if train_ds is None:
        train_ds = load_split(config, "train", data_dir)
    if val_ds is None:
        val_ds = load_split(config, "val", data_dir)
    val_ds = apply_val_cuts(val_ds, config)
    if config.get("use_test_split", False) and test_ds is None:
        test_ds = load_split(config, "test", data_dir)

    batch_size = int(config["batch_size"])
    epochs = int(config["epochs"])
    patience = int(config["patience"])
    pos_weight = float(train_ds.pos_weight)
    steps_per_epoch = len(train_ds) // batch_size
    log(f"num_notbts: {train_ds.num_neg}  num_bts: {train_ds.num_pos}  "
        f"pos_weight: {pos_weight:.3f}")

    # /---------------- model / optimizer ----------------/
    # compute_dtype "bfloat16" enables mixed precision: params/optimizer
    # state stay f32, layer compute runs bf16, loss/grads accumulate f32.
    compute_dtype = jnp.dtype(config.get("compute_dtype", "float32"))
    model, variables = init_model(config, rng=seed, dtype=compute_dtype)
    if initial_variables is not None:
        # pre-loaded weights (e.g. frozen_fusion branches via
        # models.fusion.load_fusion_branches, or converted checkpoints)
        variables = initial_variables
    elif config["model_name"] == "frozen_fusion" and \
            config.get("image_model_dir") and not config.get(
                "skip_load_state", False):
        from ..models.fusion import load_fusion_branches
        variables = load_fusion_branches(config, variables)
        log("Loaded frozen-fusion branch weights from model dirs")
    elif config.get("backbone_checkpoint") or config.get("pretrained"):
        # reference recipe: backbones start from pretrained timm/zoobot
        # weights (architectures.py:31,62,108,132) — via an explicit local
        # backbone checkpoint, or timm when importable; the hook itself
        # decides which model families qualify (pretrained.BACKBONE_MODELS)
        from ..interop.pretrained import maybe_init_pretrained
        variables = maybe_init_pretrained(config, variables, log=log)
    tx = make_optimizer(config, steps_per_epoch)
    state = create_train_state(config, variables, tx, seed=seed)

    data_shard = None
    if mesh is not None:
        state = state.replace(
            params=shard_variables(state.params, mesh),
            batch_stats=shard_variables(state.batch_stats, mesh),
            opt_state=shard_variables(state.opt_state, mesh),
        )
        data_shard = batch_sharding(mesh)

    # Device-resident data path: upload the train set once, gather batches
    # on device by index (config "device_data"; single-mesh-axis only —
    # under a data-sharded mesh, host batching already ships shards).
    device_data = bool(config.get("device_data", False)) and mesh is None
    if device_data:
        from .steps import make_device_train_step, put_dataset_on_device
        image_dtype = config.get("device_data_dtype")
        dev_images, dev_metadata, dev_labels = put_dataset_on_device(
            train_ds,
            image_dtype=jnp.dtype(image_dtype) if image_dtype else None)
        train_step = make_device_train_step(
            model, tx, config, dev_images, dev_metadata, dev_labels,
            teacher=teacher)
    else:
        # the loop rebinds state every step, so donate its buffers
        train_step = make_train_step(model, tx, config, donate=True,
                                     teacher=teacher, mesh=mesh)
    if teacher is not None:
        log(f"Distilling from teacher "
            f"(alpha={config.get('distill_alpha', 0.5)}, "
            f"T={config.get('distill_temperature', 2.0)})")

    run_model_name = (f"{config['model_name']}_{config['train_data_version']}"
                      f"_N{config.get('N_max', 100)}_tpu")
    model_dir = os.path.join(out_root, run_model_name, run_name)
    os.makedirs(model_dir, exist_ok=True)

    # /---------------- history / resume ----------------/
    train_losses = np.zeros(epochs)
    train_accs = np.zeros(epochs)
    val_losses = np.full(epochs, np.inf)
    val_accs = np.zeros(epochs)
    start_epoch = 0
    epochs_since_improvement = 0
    best_raw_preds = None
    best_val_labels = None

    latest_dir = os.path.join(model_dir, "latest")
    best_dir = os.path.join(model_dir, "best")
    if resume and os.path.isdir(latest_dir):
        state, extra = restore_train_state(latest_dir, state)
        if mesh is not None:
            # restore_train_state hands back host-numpy leaves — re-apply
            # the mesh placement or the jitted step silently runs with
            # default (replicated) sharding, diverging from the fresh path
            state = state.replace(
                params=shard_variables(state.params, mesh),
                batch_stats=shard_variables(state.batch_stats, mesh),
                opt_state=shard_variables(state.opt_state, mesh),
            )
        start_epoch = int(extra["epoch"]) + 1
        epochs_since_improvement = int(extra["epochs_since_improvement"])
        for name, arr in (("train_losses", train_losses),
                          ("train_accs", train_accs),
                          ("val_losses", val_losses),
                          ("val_accs", val_accs)):
            prev = np.asarray(extra[name])
            arr[:prev.size] = prev[:arr.size]
        log(f"Resumed from {latest_dir} at epoch {start_epoch}")

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return jax.device_put(x, data_shard) if data_shard is not None else x

    pos_weight_dev = jnp.float32(pos_weight)

    # /---------------- epoch loop ----------------/
    final_epoch = max(start_epoch - 1, 0)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        # loss/correct stay device scalars until the end of the epoch: the
        # host never synchronizes per batch, so step dispatch runs ahead of
        # the device (and of high-latency links) while batches assemble
        losses = []
        corrects = []
        seen = 0
        if device_data:
            order = np.arange(len(train_ds))
            np.random.default_rng(seed + epoch).shuffle(order)
            n_steps = len(train_ds) // batch_size
            for b in range(n_steps):
                idx = jnp.asarray(
                    order[b * batch_size:(b + 1) * batch_size], jnp.int32)
                state, m = train_step(state, idx, pos_weight_dev)
                losses.append(m["loss"])
                corrects.append(m["correct"])
                seen += batch_size
        else:
            for images, metadata, labels in iterate_batches(
                    train_ds, batch_size, shuffle=True, drop_last=True,
                    seed=seed + epoch):
                state, m = train_step(state, put(images), put(metadata),
                                      put(labels), pos_weight_dev)
                losses.append(m["loss"])
                corrects.append(m["correct"])
                seen += len(labels)
        epoch_train_loss = float(np.mean([float(x) for x in losses]))
        epoch_train_acc = int(sum(int(c) for c in corrects)) / max(1, seen)
        train_losses[epoch] = epoch_train_loss
        train_accs[epoch] = epoch_train_acc

        val_loss, val_acc, val_raw_preds, val_labels = evaluate(
            model, config, state.params, state.batch_stats, val_ds,
            pos_weight, batch_size, data_shard)
        val_losses[epoch] = val_loss
        val_accs[epoch] = val_acc
        final_epoch = epoch

        log(f"epoch {epoch + 1}/{epochs}  t={time.time() - t0:.1f}s  "
            f"train loss {epoch_train_loss:.5f} acc {epoch_train_acc:.5f}  "
            f"val loss {val_loss:.5f} acc {val_acc:.5f}")

        # early stopping with the reference's 0.5% improvement margin
        prev_best = float(np.min(val_losses[:epoch])) if epoch > 0 else np.inf
        improved = 1.005 * val_loss < prev_best
        if improved:
            save_model_variables(best_dir, state.params, state.batch_stats)
            best_raw_preds = np.copy(val_raw_preds)
            best_val_labels = np.copy(val_labels)
            epochs_since_improvement = 0
            log(f"  val loss improved from {prev_best:.5f}; saved best model")
        else:
            epochs_since_improvement += 1
            log(f"  no improvement for {epochs_since_improvement} epoch(s)")

        # save latest (full resume state) AFTER the patience update, so a
        # resume restores this epoch's improvement outcome rather than a
        # one-epoch-stale counter
        save_train_state(latest_dir, state, {
            "epoch": epoch,
            "epochs_since_improvement": epochs_since_improvement,
            "train_losses": train_losses[:epoch + 1],
            "train_accs": train_accs[:epoch + 1],
            "val_losses": val_losses[:epoch + 1],
            "val_accs": val_accs[:epoch + 1],
        })

        if not improved and epochs_since_improvement >= patience:
            log("  triggered early stopping")
            break

        epoch_metrics = {
            "epoch": epoch,
            "train_loss": epoch_train_loss,
            "train_accuracy": epoch_train_acc,
            "val_loss": val_loss,
            "val_accuracy": val_acc,
            "learning_rate": float(lr_at_epoch(
                epoch, float(config["learning_rate"]), epochs,
                int(config.get("warmup_epochs", 0)))),
        }
        if logger is not None:
            logger.log(epoch_metrics, step=epoch)
        if epoch_callback is not None:
            epoch_callback(epoch, epoch_metrics)

    if best_raw_preds is None:  # no epoch improved (resume edge): use last
        if start_epoch >= epochs:
            # resumed a run that had already finished every epoch — the
            # loop body never ran, so evaluate once for the report
            _, _, val_raw_preds, val_labels = evaluate(
                model, config, state.params, state.batch_stats, val_ds,
                pos_weight, batch_size, data_shard)
        best_raw_preds = val_raw_preds
        best_val_labels = val_labels

    # /---------------- final analysis ----------------/
    run_data = {
        "run_name": run_name,
        "train_loss": train_losses[:final_epoch + 1],
        "train_accuracy": train_accs[:final_epoch + 1],
        "val_loss": val_losses[:final_epoch + 1],
        "val_accuracy": val_accs[:final_epoch + 1],
    }

    # final analysis evaluates the BEST checkpoint — the reference runs its
    # test eval on the reloaded best_model.pth (train.py:370-375), while the
    # loop-exit state is up to `patience` epochs past the best; reload from
    # best_dir (in-memory refs would trip train_step's buffer donation)
    eval_params, eval_stats = state.params, state.batch_stats
    if os.path.isdir(best_dir):
        from .checkpoint import load_model_variables
        best_vars = load_model_variables(best_dir)
        eval_params = best_vars["params"]
        eval_stats = best_vars.get("batch_stats", {})

    summaries = {}
    analysis = [("val", val_ds, best_raw_preds, best_val_labels)]
    if test_ds is not None:
        _, _, test_preds, test_labels = evaluate(
            model, config, eval_params, eval_stats, test_ds,
            pos_weight, batch_size, data_shard)
        analysis.append(("test", test_ds, test_preds, test_labels))

    for split, ds, preds, labels in analysis:
        if ds.candidates is not None and "objectId" in ds.candidates:
            summary = diagnostic_summary(
                ds.candidates, preds, labels,
                run_data={
                    "run_name": run_name,
                    "loss": run_data["train_loss"],
                    "accuracy": run_data["train_accuracy"],
                    "val_loss": run_data["val_loss"],
                    "val_accuracy": run_data["val_accuracy"],
                },
                make_figure=make_figure,
                fig_path=os.path.join(model_dir, f"{split}_diagnostics.pdf"),
            )
            summary.pop("fig", None)
        else:
            from ..metrics.classification import alert_metrics
            summary = alert_metrics(labels, preds)
        summaries[split] = summary

    make_report(config, os.path.join(model_dir, "report.json"), run_data,
                summaries["val"])

    if logger is not None:
        from ..utils.logging import summary_from_diagnostics
        flat: dict[str, Any] = {}
        for split, summary in summaries.items():
            if "policy_performance" in summary or "roc_auc" in summary:
                flat.update(summary_from_diagnostics(
                    summary, prefix="" if split == "val" else f"{split}_"))
        logger.set_summary(flat)

    # optional penultimate-layer embeddings (the reference reads this flag
    # but its generator module is missing from the package — train.py:449-469)
    if config.get("generate_embeddings", False):
        try:
            from ..metrics.embeddings import generate_embeddings

            emb_ds = test_ds if test_ds is not None else val_ds
            candids = (emb_ds.candidates["candid"].to_numpy()
                       if emb_ds.candidates is not None
                       and "candid" in emb_ds.candidates
                       else None)
            emb = generate_embeddings(
                model, config, eval_params, eval_stats, emb_ds,
                candids=candids, seed=seed)
            import pandas as pd
            pd.DataFrame(emb, columns=["umap_emb_1", "umap_emb_2", "candid"]
                         ).to_csv(os.path.join(model_dir, "embeddings.csv"),
                                  index=False)
            log(f"Wrote embeddings for {len(emb)} alerts")
        except Exception as e:  # noqa: BLE001 — mirror reference's guard
            log(f"Error generating embeddings: {e}; skipping.")

    log(f"Best val loss: {np.min(val_losses[:final_epoch + 1]):.5f}  "
        f"best val acc: {np.max(val_accs[:final_epoch + 1]):.5f}")
    log(f"Model diagnostics at {model_dir}")

    return {
        "model_dir": model_dir,
        "model": model,
        "state": state,
        "history": run_data,
        "summaries": summaries,
    }
