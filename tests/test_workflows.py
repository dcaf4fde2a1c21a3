"""Full reference workflows as integration tests: MaxViT training (BN stats
under jit), and the two-stage frozen-fusion pipeline (train branches →
load+freeze → train combined head)."""

import numpy as np
import pytest

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.dataset import AlertDataset
from btsbot_tpu.engine.state import create_train_state, make_optimizer
from btsbot_tpu.engine.steps import make_train_step
from btsbot_tpu.engine.train import run_training
from btsbot_tpu.models import maxvit as maxvit_mod
from btsbot_tpu.models.fusion import load_fusion_branches
from test_engine import SMALL_CFG, synthetic_dataset

TINY_MAXVIT = {"depths": (1, 1), "dims": (32, 64), "stem_width": 32}


@pytest.fixture
def tiny_maxvit(monkeypatch):
    monkeypatch.setitem(maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny", TINY_MAXVIT)


def test_maxvit_train_step_updates_bn(tiny_maxvit):
    config = normalize_config({
        **SMALL_CFG,
        "model_name": "mm_MaxViT",
        "model_kind": "maxvit_tiny_rw_64.test",
    })
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=2)
    state = create_train_state(config, variables, tx)
    step = make_train_step(model, tx, config)

    ds = synthetic_dataset(16, seed=0)
    new_state, metrics = step(state, jnp.asarray(ds.images),
                              jnp.asarray(ds.metadata),
                              jnp.asarray(ds.labels), jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    # backbone BN stats updated under jit
    old = np.asarray(
        state.batch_stats["backbone"]["stem_norm1"]["mean"])
    new = np.asarray(
        new_state.batch_stats["backbone"]["stem_norm1"]["mean"])
    assert not np.allclose(old, new)
    # params moved
    k_old = np.asarray(state.params["combined_head"]["out"]["kernel"])
    k_new = np.asarray(new_state.params["combined_head"]["out"]["kernel"])
    assert not np.allclose(k_old, k_new)


def test_frozen_fusion_full_workflow(tmp_path):
    """The complete reference frozen-fusion recipe (train.py:224-236 +
    architectures.py:296-372): train an image model and a metadata model,
    fuse their trained branches, train only the combined head, and verify
    the fused model outperforms chance while branches stay at their trained
    weights."""
    train_ds = synthetic_dataset(192, seed=0)
    val_ds = synthetic_dataset(96, seed=1)

    img_cfg = normalize_config({**SMALL_CFG, "model_name": "um_cnn",
                                "fc1_neurons": 16, "fc2_neurons": 8,
                                "dropout": 0.1, "epochs": 2})
    img_result = run_training(
        img_cfg, run_name="b", out_root=str(tmp_path / "img"),
        train_ds=AlertDataset(labels=train_ds.labels,
                              images=train_ds.images),
        val_ds=AlertDataset(labels=val_ds.labels, images=val_ds.images),
        make_figure=False, log=lambda *_: None)

    # epochs sized for the torch-default init (models/init.py): the head
    # sits at the majority class for ~2 epochs before learning (flax init
    # needed only 3 epochs; the shipped default needs the longer schedule)
    meta_cfg = normalize_config({**SMALL_CFG, "model_name": "um_nn",
                                 "epochs": 6, "learning_rate": 5e-3})
    meta_result = run_training(
        meta_cfg, run_name="b", out_root=str(tmp_path / "meta"),
        train_ds=AlertDataset(labels=train_ds.labels,
                              metadata=train_ds.metadata),
        val_ds=AlertDataset(labels=val_ds.labels, metadata=val_ds.metadata),
        make_figure=False, log=lambda *_: None)

    fusion_cfg = normalize_config({
        **SMALL_CFG,
        "model_name": "frozen_fusion",
        "image_model_dir": img_result["model_dir"],
        "meta_model_dir": meta_result["model_dir"],
        "image_model_config": dict(img_cfg),
        "meta_model_config": dict(meta_cfg),
        "epochs": 8,
        "learning_rate": 5e-3,
    })
    model, fusion_vars = init_model(fusion_cfg, rng=0)
    fusion_vars = load_fusion_branches(fusion_cfg, fusion_vars)
    branch_kernel_before = np.array(
        fusion_vars["params"]["image_branch"]["backbone"]["conv1a"]["kernel"])

    result = run_training(
        fusion_cfg, run_name="f", out_root=str(tmp_path / "fusion"),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None, initial_variables=fusion_vars)

    assert result["history"]["val_accuracy"][-1] > 0.75
    after = np.asarray(
        result["state"].params["image_branch"]["backbone"]["conv1a"]
        ["kernel"])
    np.testing.assert_array_equal(branch_kernel_before, after)
