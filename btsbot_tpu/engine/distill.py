"""Knowledge distillation: trained teacher → TPU-native serving variant.

The reference ships exactly one way to obtain a production model: train a
timm-backed torch model and publish it (`/root/reference/btsbot/train.py`,
`to_HF.py`).  This module adds a capability the reference lacks that the
TPU rebuild makes valuable: compress a trained (or converted-from-reference)
mm_ConvNeXt into the ``inceptionnext_*`` serving variant — same topology,
decomposed token mixer, 1.41× measured throughput on v5e
(models/convnext.py::InceptionMixer) — by distilling its scores instead of
retraining from labels alone.

The distillation loss (engine/loss.py::binary_kd_loss) runs the teacher
forward inside the same jitted train step (engine/steps.py), so a distill
step costs one XLA dispatch exactly like a plain train step.

Typical use::

    from btsbot_tpu.engine.distill import distill_to_student

    result = distill_to_student(
        teacher_dir="models/BTSbot-convnext-imagenet-metadata",  # HF snapshot
        student_kind="inceptionnext_pico",
        train_ds=train_ds, val_ds=val_ds)

Reference for the teacher side: `/root/reference/btsbot/from_HF.py:59-81`
(checkpoint loading) — the student side has no reference counterpart.
"""

from __future__ import annotations

from typing import Any

from ..core.config import normalize_config
from ..models.factory import build_model


def load_teacher(teacher_dir: str, dtype=None):
    """(model, variables, config) for a local model directory.

    Accepts either an HF-style snapshot (train_config.json +
    pytorch_model.bin, as produced by the reference's publishing pipeline)
    or a directory trained by this package (train_config.json + an orbax
    ``best``/``latest`` checkpoint from engine/checkpoint.py).
    """
    import json
    import os

    import jax.numpy as jnp

    if os.path.isfile(os.path.join(teacher_dir, "pytorch_model.bin")):
        from ..interop.hf import load_model_dir
        return load_model_dir(teacher_dir, dtype=dtype)

    cfg_path = os.path.join(teacher_dir, "train_config.json")
    report_path = os.path.join(teacher_dir, "report.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            config = normalize_config(json.load(f))
    elif os.path.isfile(report_path):
        # a training run dir (ours or the reference's): config lives inside
        # report.json (metrics/report.py == reference make_report schema,
        # utils.py:51-67)
        from ..metrics.report import load_report_config

        config = normalize_config(load_report_config(teacher_dir))
    else:
        raise FileNotFoundError(
            f"{teacher_dir}: need train_config.json or report.json plus "
            "either pytorch_model.bin (HF snapshot), a best/ checkpoint "
            "(btsbot_tpu run), or best_model.pth (reference run)")
    from ..engine.checkpoint import load_model_checkpoint

    variables = load_model_checkpoint(config, teacher_dir)
    model = build_model(config, dtype=dtype or jnp.float32)
    return model, variables, config


def student_config_from_teacher(teacher_config, student_kind: str,
                                **overrides) -> dict:
    """Derive the student's train config from the teacher's: identical
    head/metadata/aug/optimizer settings, only the backbone kind swapped.
    Extra keyword overrides win (e.g. epochs, learning_rate,
    distill_alpha, distill_temperature)."""
    cfg = dict(teacher_config)
    cfg["model_kind"] = student_kind
    cfg.pop("pretrained", None)          # no timm init for TPU-native kinds
    cfg.pop("backbone_checkpoint", None)
    cfg.update(overrides)
    return normalize_config(cfg)


def distill_to_student(
    teacher_dir: str | None = None,
    teacher: tuple | None = None,
    teacher_config=None,
    student_kind: str = "inceptionnext_pico",
    student_config=None,
    **train_kwargs: Any,
):
    """Distill a trained teacher into a faster student; returns
    ``run_training``'s result dict (history, model_dir, summaries).

    Provide either ``teacher_dir`` (loaded via :func:`load_teacher`) or a
    pre-loaded ``teacher=(model, variables)`` with ``teacher_config``.
    ``student_config`` overrides the derived config entirely; otherwise it
    is the teacher's config with ``model_kind=student_kind``.
    ``train_kwargs`` pass through to :func:`engine.train.run_training`
    (datasets, run_name, mesh, logger, …).
    """
    from .train import run_training

    if teacher is None:
        if teacher_dir is None:
            raise ValueError("need teacher_dir or teacher=(model, variables)")
        t_model, t_variables, teacher_config = load_teacher(teacher_dir)
        teacher = (t_model, t_variables)
    elif teacher_config is None and student_config is None:
        raise ValueError("pre-loaded teacher needs teacher_config "
                         "(to derive the student) or student_config")

    if student_config is None:
        student_config = student_config_from_teacher(
            teacher_config, student_kind)
    return run_training(student_config, teacher=teacher, **train_kwargs)
