"""Shape/init smoke tests across the full model registry, including MaxViT
(whose numerical parity oracle lands with the MaxViT converter) and
frozen_fusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu import build_model, init_model, normalize_config

META_COLS = [f"m{i}" for i in range(25)]

FULL_CFG = {
    "train_data_version": "v10",
    "metadata_cols": META_COLS,
    "conv1_channels": 8,
    "conv2_channels": 16,
    "conv_kernel": 5,
    "conv_dropout1": 0.5,
    "conv_dropout2": 0.55,
    "meta_fc1_neurons": 32,
    "meta_fc2_neurons": 32,
    "meta_dropout": 0.25,
    "comb_fc1_neurons": 8,
    "comb_fc2_neurons": 8,
    "comb_dropout": 0.2,
    "fc1_neurons": 32,
    "fc2_neurons": 16,
    "dropout": 0.4,
    "model_kind": "convnext_pico.d1_in1k",
}


@pytest.mark.parametrize("model_name", [
    "mm_cnn", "um_cnn", "um_nn", "ConvNeXt", "mm_ConvNeXt",
])
def test_init_and_forward(model_name):
    config = normalize_config({**FULL_CFG, "model_name": model_name})
    model, variables = init_model(config, rng=0)
    n = 4
    img = jnp.ones((n, 63, 63, 3)) if config.need_triplets else None
    meta = jnp.ones((n, 25)) if config.need_metadata else None
    out = model.apply(variables, image_input=img, metadata_input=meta,
                      train=False)
    assert out.shape == (n, 1)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("model_name", ["MaxViT", "mm_MaxViT"])
def test_maxvit_small_input(model_name):
    # Keep CPU compile time sane: use a 128-native variant (window 4; stage
    # sizes 32/16/8/4 all divide evenly) instead of the production 224.
    config = normalize_config({
        **FULL_CFG,
        "model_name": model_name,
        "model_kind": "maxvit_tiny_rw_128.test",
    })
    model, variables = init_model(config, rng=0)
    n = 2
    img = jnp.ones((n, 63, 63, 3))
    meta = jnp.ones((n, 25)) if config.need_metadata else None
    out = model.apply(variables, image_input=img, metadata_input=meta,
                      train=False)
    assert out.shape == (n, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_frozen_fusion_forward():
    image_cfg = normalize_config({**FULL_CFG, "model_name": "um_cnn"})
    meta_cfg = normalize_config({**FULL_CFG, "model_name": "um_nn"})
    config = normalize_config({
        "model_name": "frozen_fusion",
        "metadata_cols": META_COLS,
        "image_model_config": dict(image_cfg),
        "meta_model_config": dict(meta_cfg),
        "image_model_dir": "",
        "meta_model_dir": "",
        "comb_fc1_neurons": 8,
        "comb_fc2_neurons": 8,
        "comb_dropout": 0.2,
    })
    model, variables = init_model(config, rng=0)
    out = model.apply(variables, image_input=jnp.ones((3, 63, 63, 3)),
                      metadata_input=jnp.ones((3, 25)), train=False)
    assert out.shape == (3, 1)
    # branch subtrees are named for checkpoint loading + optimizer freezing
    assert "image_branch" in variables["params"]
    assert "meta_branch" in variables["params"]
    assert "combined_head" in variables["params"]


def test_train_mode_updates_batch_stats():
    config = normalize_config({**FULL_CFG, "model_name": "um_nn"})
    model, variables = init_model(config, rng=0)
    meta = jax.random.normal(jax.random.key(1), (8, 25))
    out, updates = model.apply(
        variables, metadata_input=meta, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)})
    assert out.shape == (8, 1)
    old = variables["batch_stats"]["branch"]["bn"]["mean"]
    new = updates["batch_stats"]["branch"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_unknown_model_name_raises():
    with pytest.raises(ValueError, match="Could not find model"):
        build_model({"model_name": "nope", "metadata_cols": []})
