"""Loss functions.

The reference trains every model with class-weighted binary cross-entropy on
logits: ``BCEWithLogitsLoss(pos_weight=num_notbts/num_bts)``
(`/root/reference/btsbot/train.py:211-212`).  Reproduced here in the
numerically-stable log-sigmoid form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_bce_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    pos_weight: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Mean of −[w·y·log σ(x) + (1−y)·log(1−σ(x))] (torch BCEWithLogitsLoss
    semantics, including ``pos_weight`` scaling of the positive term)."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_example = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(per_example)


def binary_kd_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 2.0,
) -> jnp.ndarray:
    """Binary knowledge-distillation loss (Hinton et al. 2015 adapted to a
    single sigmoid logit): cross-entropy of the temperature-softened student
    logit against the teacher's softened probability, scaled by T² so the
    gradient magnitude is temperature-invariant.

    Used to transfer a trained mm_ConvNeXt (reference-checkpoint-compatible)
    into the TPU-native ``inceptionnext_*`` serving variant without
    retraining from labels alone (see engine/distill.py)."""
    t = jnp.float32(temperature)
    z = student_logits.reshape(-1).astype(jnp.float32) / t
    soft = jax.nn.sigmoid(
        teacher_logits.reshape(-1).astype(jnp.float32) / t)
    soft = jax.lax.stop_gradient(soft)
    return t * t * weighted_bce_with_logits(z, soft, 1.0)


def binary_accuracy(scores: jnp.ndarray, labels: jnp.ndarray,
                    threshold: float = 0.5) -> jnp.ndarray:
    """Fraction of (score > threshold) == label (reference train.py:538-540,
    val.py:168; production threshold 0.5)."""
    preds = (scores.reshape(-1) > threshold).astype(jnp.float32)
    return jnp.mean((preds == labels.reshape(-1).astype(jnp.float32))
                    .astype(jnp.float32))
