"""Evaluation loop (the reference's ``val.run_val``, val.py:31-170).

Differences by design: the model is evaluated in-memory (the reference
re-instantiates the model and reloads the checkpoint from disk every epoch,
val.py:61-69); the final partial batch is padded to the compiled batch shape
and masked (static shapes — one XLA program for the whole split, no
recompiles).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import AlertDataset, iterate_batches
from .loss import weighted_bce_with_logits
from .steps import make_eval_step


def predict_dataset(
    model,
    config,
    params,
    batch_stats,
    dataset: AlertDataset,
    batch_size: int | None = None,
    sharding=None,
) -> tuple[np.ndarray, np.ndarray]:
    """(logits, sigmoid scores) for every alert in the dataset, in order."""
    batch_size = batch_size or int(config["batch_size"])
    eval_step = make_eval_step(model, config)

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    logits_out = []
    scores_out = []
    for images, metadata, labels in iterate_batches(dataset, batch_size):
        n = len(labels)
        if n < batch_size:  # pad final batch to the compiled shape
            pad = batch_size - n
            if images is not None:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
            if metadata is not None:
                metadata = np.concatenate(
                    [metadata, np.zeros((pad,) + metadata.shape[1:],
                                        metadata.dtype)])
        logits, scores = eval_step(params, batch_stats, put(images),
                                   put(metadata))
        logits_out.append(np.asarray(logits)[:n])
        scores_out.append(np.asarray(scores)[:n])
    if not logits_out:
        return np.zeros((0,)), np.zeros((0,))
    return np.concatenate(logits_out), np.concatenate(scores_out)


def evaluate(
    model,
    config,
    params,
    batch_stats,
    dataset: AlertDataset,
    pos_weight: float = 1.0,
    batch_size: int | None = None,
    sharding=None,
):
    """(loss, accuracy, raw_preds, labels) — reference run_val return
    contract (val.py:159-170): pos-weighted BCE over the full split and
    0.5-threshold accuracy."""
    logits, scores = predict_dataset(model, config, params, batch_stats,
                                     dataset, batch_size, sharding)
    labels = dataset.labels
    loss = float(weighted_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.float32(pos_weight)))
    acc = float(np.mean((scores > 0.5) == (labels > 0.5)))
    return loss, acc, scores, labels
