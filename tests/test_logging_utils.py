"""Experiment loggers and the wandb summary key schema."""

import json

import numpy as np

from btsbot_tpu.utils.logging import (
    JsonlLogger,
    NullLogger,
    make_logger,
    summary_from_diagnostics,
)


def test_jsonl_logger_roundtrip(tmp_path):
    path = str(tmp_path / "log.jsonl")
    logger = JsonlLogger(path)
    logger.log({"train_loss": 0.5, "val_loss": np.float32(0.25)}, step=3)
    logger.set_summary({"ROC_AUC": 0.99})
    logger.finish()

    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["step"] == 3 and lines[0]["train_loss"] == 0.5
    assert lines[0]["val_loss"] == 0.25
    assert lines[1]["summary"]["ROC_AUC"] == 0.99


def test_make_logger_kinds(tmp_path):
    assert isinstance(make_logger("null"), NullLogger)
    assert isinstance(make_logger("jsonl", path=str(tmp_path / "x.jsonl")),
                      JsonlLogger)
    # wandb not installed in this environment → graceful NullLogger
    assert isinstance(make_logger("wandb"), NullLogger)


def test_summary_key_schema_matches_reference():
    """Key names per the reference's wandb.summary block
    (train.py:402-428)."""
    summary = {
        "roc_auc": 0.9, "bal_acc": 0.8, "bts_acc": 0.85, "notbts_acc": 0.75,
        "alert_precision": 0.7, "alert_recall": 0.6,
        "policy_performance": {
            "prod_p1": {"policy_precision": 0.9, "policy_recall": 0.8,
                        "binned_precision": [1.0], "binned_recall": [0.9],
                        "peakmag_bins": [17.0], "med_save_dt": -0.5,
                        "med_trigger_dt": 0.1},
        },
    }
    flat = summary_from_diagnostics(summary)
    for key in ("ROC_AUC", "bal_acc", "bts_acc", "notbts_acc",
                "alert_precision", "alert_recall", "alert_F1",
                "prod_p1_precision", "prod_p1_recall", "prod_p1_F1",
                "prod_p1_binned_precision", "prod_p1_binned_recall",
                "prod_p1_peakmag_bins", "prod_p1_save_dt",
                "prod_p1_trigger_dt"):
        assert key in flat, key
    test_flat = summary_from_diagnostics(summary, prefix="test_")
    assert "test_ROC_AUC" in test_flat


def test_time_device_fn_honest_timer():
    """The scan-chained honest timer returns sane per-invocation seconds and
    actually executes the function (the methodology bench.py inlines)."""
    import jax.numpy as jnp

    from btsbot_tpu.utils.profiling import time_device_fn

    x = jnp.ones((64, 64), jnp.float32)
    w = jnp.full((64, 64), 2.0, jnp.float32)

    def fn(a, b):
        return a @ b

    dt = time_device_fn(fn, (x, w), iters=5, reps=2)
    assert 0.0 < dt < 5.0
