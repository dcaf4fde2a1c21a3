"""Jit-compiled train / eval / predict steps.

This is the replacement for the reference's per-batch Python loop
(`/root/reference/btsbot/train.py:481-566` and val.py:128-157): one traced
XLA program per step containing on-device augmentation, the forward pass,
weighted-BCE loss, backward pass, and the optimizer update.  Under a sharded
mesh (parallel.mesh) the batch is split on the "data" axis and XLA inserts
the gradient all-reduce — the TPU-native form of DataParallel's
scatter/gather (SURVEY.md §2).

The augmentation RNG is derived by folding the step counter into the state's
base key, so training is bit-reproducible per seed regardless of host
threading (fixing the reference's unseeded CPU transforms, train.py:106-107).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.augment import augment_triplets
from .loss import binary_kd_loss, weighted_bce_with_logits
from .state import TrainState


def make_train_step(model, tx, config, donate: bool = False, teacher=None,
                    mesh=None):
    """donate=True donates the input TrainState's buffers to the update
    (in-place param/optimizer memory, no copy per step) — use in training
    loops that immediately rebind the state; leave False when the caller
    inspects the pre-step state afterwards.

    teacher=(teacher_model, teacher_variables) adds knowledge distillation:
    the teacher scores the same (augmented) batch inside the step graph,
    and the loss becomes alpha·BCE(labels) + (1−alpha)·KD(teacher), with
    ``distill_alpha`` / ``distill_temperature`` from config (defaults
    0.5 / 2.0).  The teacher forward runs inside the same XLA program — no
    second dispatch — and its weights never receive gradients; they enter
    as jit arguments (not closure constants) so they are never embedded in
    the serialized program.

    mesh: pass the training mesh when distilling under sharded state — the
    teacher's weights are placed with the same parallel.sharding rules as
    the student's, so the jitted step sees consistent shardings instead of
    single-device-committed teacher arrays fighting a sharded student.
    """
    need_triplets = config.need_triplets
    need_metadata = config.need_metadata
    if teacher is not None:
        teacher_model, teacher_variables = teacher
        if mesh is not None:
            from ..parallel.sharding import shard_variables
            teacher_variables = shard_variables(teacher_variables, mesh)
        else:
            teacher_variables = jax.tree_util.tree_map(jnp.asarray,
                                                       teacher_variables)
        distill_alpha = float(config.get("distill_alpha", 0.5))
        distill_temp = float(config.get("distill_temperature", 2.0))
    aug_flags = dict(
        h_flip=bool(config.get("data_aug_h_flip", True)),
        v_flip=bool(config.get("data_aug_v_flip", True)),
        rot=bool(config.get("data_aug_rot", True)),
    )
    do_augment = need_triplets and any(aug_flags.values())

    jit = functools.partial(jax.jit, donate_argnums=(0,)) if donate \
        else jax.jit

    @jit
    def _train_step(state: TrainState, images, metadata, labels, pos_weight,
                    t_vars):
        step_rng = jax.random.fold_in(state.rng, state.step)
        aug_rng, dropout_rng = jax.random.split(step_rng)

        if do_augment:
            images = augment_triplets(aug_rng, images, **aug_flags)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables,
                image_input=images if need_triplets else None,
                metadata_input=metadata if need_metadata else None,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            logits, updates = out
            loss = weighted_bce_with_logits(logits, labels, pos_weight)
            if teacher is not None:
                t_logits = teacher_model.apply(
                    t_vars,
                    image_input=images if need_triplets else None,
                    metadata_input=metadata if need_metadata else None,
                    train=False)
                kd = binary_kd_loss(logits, t_logits, distill_temp)
                loss = distill_alpha * loss + (1.0 - distill_alpha) * kd
            return loss, (logits, updates.get("batch_stats", {}))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats if state.batch_stats else state.batch_stats,
            opt_state=new_opt_state,
        )
        scores = jax.nn.sigmoid(logits.reshape(-1).astype(jnp.float32))
        # accuracy numerator computed in-graph so the host loop never has
        # to synchronize per batch (it reads the epoch's scalars at the end)
        correct = jnp.sum((scores > 0.5) == (labels.reshape(-1) > 0.5))
        return new_state, {"loss": loss, "logits": logits.reshape(-1),
                           "scores": scores, "correct": correct}

    def train_step(state: TrainState, images, metadata, labels, pos_weight):
        return _train_step(state, images, metadata, labels, pos_weight,
                           teacher_variables if teacher is not None else None)

    # expose the argument-taking core so wrappers that jit AROUND this step
    # (make_device_train_step) can thread the teacher weights through as a
    # traced argument — a closure capture there would embed them as
    # constants in the outer program (the HTTP-413/HBM hazard documented
    # below on make_device_train_step)
    train_step.inner = _train_step
    train_step.teacher_variables = \
        teacher_variables if teacher is not None else None
    return train_step


def make_device_train_step(model, tx, config, images, metadata, labels,
                           teacher=None):
    """Train step over a device-resident dataset, batched by index.

    The whole training set is uploaded once (BTS-scale sets are a few GB —
    well within one chip's HBM) and each step gathers its shuffled batch
    with ``jnp.take`` on device; the host only ships a (batch,) int32 index
    array per step.  This removes the per-batch host→device image transfer
    entirely — the TPU-idiomatic replacement for DataLoader worker
    pipelines (reference train.py:201-209), and essential when the host link
    is high-latency (remote-relay setups).
    """
    base = make_train_step(model, tx, config, teacher=teacher)
    need_triplets = config.need_triplets
    need_metadata = config.need_metadata

    # The dataset arrays (and any distillation teacher's weights) are jit
    # *arguments*, not closure captures: captured arrays lower as constants
    # embedded in the serialized program, which (a) can double their HBM
    # footprint and (b) overflows remote-compile relays on multi-hundred-MB
    # payloads (measured: HTTP 413 at ~450 MB).  As arguments they ship to
    # the device once via device_put and the compiled program stays small.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, idx, pos_weight, images, metadata, labels,
              t_vars):
        img = jnp.take(images, idx, axis=0) if need_triplets else None
        meta = jnp.take(metadata, idx, axis=0) if need_metadata else None
        lab = jnp.take(labels, idx, axis=0)
        return base.inner(state, img, meta, lab, pos_weight, t_vars)

    def device_train_step(state: TrainState, idx, pos_weight):
        return _step(state, idx, pos_weight, images, metadata, labels,
                     base.teacher_variables)

    return device_train_step


def put_dataset_on_device(dataset, sharding=None, image_dtype=None):
    """(images, metadata, labels) jnp arrays resident on device.

    image_dtype (e.g. bfloat16, config key ``device_data_dtype``) narrows
    the pixel upload — halves HBM footprint and host→device transfer for
    the one-time device-resident staging; compute dtype is unaffected
    (bf16 pixel quantization is ~0.4% relative, below serving bf16 noise).
    """
    def put(x, dtype=None):
        if x is None:
            return None
        x = jnp.asarray(x, dtype)
        return jax.device_put(x, sharding) if sharding is not None else \
            jax.device_put(x)
    return (put(dataset.images, image_dtype), put(dataset.metadata),
            put(dataset.labels))


def make_eval_step(model, config):
    need_triplets = config.need_triplets
    need_metadata = config.need_metadata

    @jax.jit
    def eval_step(params, batch_stats, images, metadata):
        variables: dict[str, Any] = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(
            variables,
            image_input=images if need_triplets else None,
            metadata_input=metadata if need_metadata else None,
            train=False,
        )
        logits = logits.reshape(-1)
        return logits, jax.nn.sigmoid(logits.astype(jnp.float32))

    return eval_step
