"""Training engine end-to-end on synthetic data: learning happens, early
stopping and checkpoint-resume semantics hold, serving path is consistent."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.dataset import AlertDataset, iterate_batches, num_batches
from btsbot_tpu.engine.checkpoint import (
    load_model_variables,
    restore_train_state,
    save_model_variables,
    save_train_state,
)
from btsbot_tpu.engine.eval import evaluate
from btsbot_tpu.engine.serve import AlertScorer, verify_serving_parity
from btsbot_tpu.engine.state import create_train_state, make_optimizer
from btsbot_tpu.engine.steps import make_train_step
from btsbot_tpu.engine.train import run_training

META_COLS = [f"m{i}" for i in range(25)]

SMALL_CFG = {
    "model_name": "mm_cnn",
    "train_data_version": "vtest",
    "metadata_cols": META_COLS,
    "conv1_channels": 8,
    "conv2_channels": 8,
    "conv_kernel": 3,
    "conv_dropout1": 0.1,
    "conv_dropout2": 0.1,
    "meta_fc1_neurons": 16,
    "meta_fc2_neurons": 16,
    "meta_dropout": 0.1,
    "comb_fc1_neurons": 8,
    "comb_fc2_neurons": 8,
    "comb_dropout": 0.1,
    "learning_rate": 2e-3,
    "beta_1": 0.9,
    "beta_2": 0.999,
    "batch_size": 32,
    "epochs": 4,
    "warmup_epochs": 1,
    "patience": 3,
    "random_seed": 1,
}


def synthetic_dataset(n=256, seed=0, image_size=63):
    """Separable toy problem: positives have a bright blob + shifted meta."""
    rng = np.random.default_rng(seed)
    labels = (rng.random(n) < 0.4).astype(np.float32)
    images = rng.normal(0, 0.1, (n, image_size, image_size, 3)).astype(
        np.float32)
    images[labels == 1, 28:35, 28:35, :] += 1.0
    meta = rng.normal(0, 1, (n, 25)).astype(np.float32)
    meta[labels == 1, :5] += 2.0
    return AlertDataset(labels=labels, images=images, metadata=meta)


def test_iterate_batches_contract():
    ds = synthetic_dataset(70)
    batches = list(iterate_batches(ds, 32, shuffle=True, drop_last=True,
                                   seed=0))
    assert len(batches) == 2 == num_batches(ds, 32, drop_last=True)
    assert all(b[2].shape == (32,) for b in batches)
    full = list(iterate_batches(ds, 32))
    assert sum(len(b[2]) for b in full) == 70
    # shuffling is seeded
    a = list(iterate_batches(ds, 32, shuffle=True, seed=3))[0][2]
    b = list(iterate_batches(ds, 32, shuffle=True, seed=3))[0][2]
    np.testing.assert_array_equal(a, b)


def test_training_learns_and_writes_artifacts(tmp_path):
    config = normalize_config(SMALL_CFG)
    train_ds = synthetic_dataset(256, seed=0)
    val_ds = synthetic_dataset(96, seed=1)

    result = run_training(
        config, run_name="t1", out_root=str(tmp_path),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)

    hist = result["history"]
    assert hist["val_accuracy"][-1] > 0.8, hist["val_accuracy"]
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    model_dir = result["model_dir"]
    assert os.path.isfile(os.path.join(model_dir, "report.json"))
    with open(os.path.join(model_dir, "report.json")) as f:
        report = json.load(f)
    assert report["train_config"]["model_name"] == "mm_cnn"
    assert "val_summary" in report

    # best checkpoint loads and reproduces evaluation
    model, template = init_model(config, rng=0)
    variables = load_model_variables(
        os.path.join(model_dir, "best"),
        template={"params": template["params"],
                  "batch_stats": template.get("batch_stats", {})})
    loss, acc, scores, labels = evaluate(
        model, config, variables["params"], variables.get("batch_stats", {}),
        val_ds, pos_weight=train_ds.pos_weight)
    assert acc > 0.8
    assert scores.shape == (96,)


def test_checkpoint_resume_roundtrip(tmp_path):
    config = normalize_config({**SMALL_CFG, "epochs": 2})
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(config, variables, tx)
    train_step = make_train_step(model, tx, config)

    ds = synthetic_dataset(64, seed=2)
    for images, metadata, labels in iterate_batches(ds, 32):
        state, _ = train_step(state, jnp.asarray(images),
                              jnp.asarray(metadata), jnp.asarray(labels),
                              jnp.float32(1.0))

    ckpt = str(tmp_path / "latest")
    save_train_state(ckpt, state, {"epoch": 0, "epochs_since_improvement": 1,
                                   "train_losses": [0.5]})

    template = create_train_state(config, variables, tx)
    restored, extra = restore_train_state(ckpt, template)
    assert extra["epoch"] == 0 and extra["epochs_since_improvement"] == 1
    assert int(restored.step) == int(state.step)
    for a, b in zip(jnp.ravel(state.params["combined_head"]["out"]["kernel"]),
                    jnp.ravel(restored.params["combined_head"]["out"]["kernel"])):
        assert float(a) == float(b)

    # continued training from restored state == continued from original
    batch = next(iterate_batches(ds, 32))
    s1, m1 = train_step(state, jnp.asarray(batch[0]), jnp.asarray(batch[1]),
                        jnp.asarray(batch[2]), jnp.float32(1.0))
    s2, m2 = train_step(restored, jnp.asarray(batch[0]),
                        jnp.asarray(batch[1]), jnp.asarray(batch[2]),
                        jnp.float32(1.0))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-7)


def test_run_training_resume_continues(tmp_path):
    config = normalize_config({**SMALL_CFG, "epochs": 2, "patience": 10})
    train_ds = synthetic_dataset(128, seed=0)
    val_ds = synthetic_dataset(64, seed=1)
    kwargs = dict(run_name="r", out_root=str(tmp_path), train_ds=train_ds,
                  val_ds=val_ds, make_figure=False, log=lambda *_: None)
    run_training(config, **kwargs)

    config4 = normalize_config({**SMALL_CFG, "epochs": 4, "patience": 10})
    result = run_training(config4, resume=True, **kwargs)
    # resumed run covers epochs 2..3 on top of the restored history
    assert len(result["history"]["train_loss"]) == 4
    assert result["history"]["train_loss"][0] > 0  # restored, not zeros


def test_resume_finished_run_regenerates_report(tmp_path):
    """Resuming a run whose every epoch already completed must regenerate
    the report instead of raising NameError (r3 review): the epoch loop
    body never runs, so the final analysis evaluates the best checkpoint."""
    config = normalize_config({**SMALL_CFG, "epochs": 2, "patience": 10})
    kwargs = dict(run_name="f", out_root=str(tmp_path),
                  train_ds=synthetic_dataset(96, seed=0),
                  val_ds=synthetic_dataset(48, seed=1),
                  make_figure=False, log=lambda *_: None)
    first = run_training(config, **kwargs)
    again = run_training(config, resume=True, **kwargs)
    assert len(again["history"]["train_loss"]) == 2
    assert "roc_auc" in again["summaries"]["val"] \
        or "alert_precision" in again["summaries"]["val"] \
        or again["summaries"]["val"]  # report built, no NameError
    del first


def test_resume_patience_counter_includes_saved_epoch(tmp_path):
    """The latest/ checkpoint must store the patience counter AFTER the
    epoch's improvement update (r3 review: it was one epoch stale).  With
    lr=0 the val loss is identical every epoch: epoch 0 improves from inf,
    epochs 1..2 do not, so the stored counter after 3 epochs is exactly 2."""
    import os

    from btsbot_tpu.engine.checkpoint import restore_train_state

    config = normalize_config({**SMALL_CFG, "epochs": 3, "patience": 10,
                               "learning_rate": 0.0})
    result = run_training(config, run_name="p", out_root=str(tmp_path),
                          train_ds=synthetic_dataset(96, seed=0),
                          val_ds=synthetic_dataset(48, seed=1),
                          make_figure=False, log=lambda *_: None)
    latest = os.path.join(result["model_dir"], "latest")
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=3)
    template = create_train_state(config, variables, tx)
    _, extra = restore_train_state(latest, template)
    assert int(extra["epoch"]) == 2
    assert int(extra["epochs_since_improvement"]) == 2


def test_frozen_fusion_branches_stay_frozen():
    image_cfg = {**SMALL_CFG, "model_name": "um_cnn", "fc1_neurons": 8,
                 "fc2_neurons": 8, "dropout": 0.1}
    meta_cfg = {**SMALL_CFG, "model_name": "um_nn"}
    config = normalize_config({
        **SMALL_CFG,
        "model_name": "frozen_fusion",
        "image_model_config": image_cfg,
        "meta_model_config": meta_cfg,
        "image_model_dir": "", "meta_model_dir": "",
    })
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=2)
    state = create_train_state(config, variables, tx)
    train_step = make_train_step(model, tx, config)

    ds = synthetic_dataset(32, seed=3)
    batch = next(iterate_batches(ds, 32))
    new_state, _ = train_step(state, jnp.asarray(batch[0]),
                              jnp.asarray(batch[1]), jnp.asarray(batch[2]),
                              jnp.float32(1.0))
    before = state.params["image_branch"]["backbone"]["conv1a"]["kernel"]
    after = new_state.params["image_branch"]["backbone"]["conv1a"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    head_before = state.params["combined_head"]["out"]["kernel"]
    head_after = new_state.params["combined_head"]["out"]["kernel"]
    assert not np.allclose(np.asarray(head_before), np.asarray(head_after))


def test_alert_scorer_padding_and_parity():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    ds = synthetic_dataset(50, seed=4)

    scorer = AlertScorer(config, variables, batch_size=16,
                         dtype=jnp.float32)
    scores = scorer(ds.images, ds.metadata)
    assert scores.shape == (50,)

    direct = np.asarray(
        model.apply(variables, image_input=jnp.asarray(ds.images),
                    metadata_input=jnp.asarray(ds.metadata),
                    train=False)).reshape(-1)
    np.testing.assert_allclose(scores, 1 / (1 + np.exp(-direct)),
                               rtol=1e-5, atol=1e-6)

    parity = verify_serving_parity(config, variables, ds.images, ds.metadata)
    assert parity["close"], parity


def test_device_data_path_matches_host_path(tmp_path):
    config_host = normalize_config({**SMALL_CFG, "epochs": 2})
    config_dev = normalize_config({**SMALL_CFG, "epochs": 2,
                                   "device_data": True})
    train_ds = synthetic_dataset(128, seed=0)
    val_ds = synthetic_dataset(64, seed=1)
    kwargs = dict(train_ds=train_ds, val_ds=val_ds, make_figure=False,
                  log=lambda *_: None)
    r1 = run_training(config_host, run_name="h", out_root=str(tmp_path / "h"),
                      **kwargs)
    r2 = run_training(config_dev, run_name="d", out_root=str(tmp_path / "d"),
                      **kwargs)
    np.testing.assert_allclose(r1["history"]["train_loss"],
                               r2["history"]["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(r1["history"]["val_loss"],
                               r2["history"]["val_loss"], rtol=1e-5)

    # narrow-dtype device staging (device_data_dtype) trains and converges
    # comparably (pixel quantization only; not bit-identical)
    config_bf16 = normalize_config({**SMALL_CFG, "epochs": 2,
                                    "device_data": True,
                                    "device_data_dtype": "bfloat16"})
    r3 = run_training(config_bf16, run_name="db",
                      out_root=str(tmp_path / "db"), **kwargs)
    np.testing.assert_allclose(r3["history"]["train_loss"],
                               r2["history"]["train_loss"], rtol=0.05)


def test_training_is_deterministic_per_seed(tmp_path):
    config = normalize_config({**SMALL_CFG, "epochs": 2})
    kwargs = dict(train_ds=synthetic_dataset(128, seed=0),
                  val_ds=synthetic_dataset(64, seed=1),
                  make_figure=False, log=lambda *_: None)
    r1 = run_training(config, run_name="a", out_root=str(tmp_path / "a"),
                      **kwargs)
    r2 = run_training(config, run_name="b", out_root=str(tmp_path / "b"),
                      **kwargs)
    np.testing.assert_array_equal(r1["history"]["train_loss"],
                                  r2["history"]["train_loss"])
    np.testing.assert_array_equal(r1["history"]["val_loss"],
                                  r2["history"]["val_loss"])
