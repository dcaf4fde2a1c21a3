"""frozen_fusion branch loading from trained checkpoints — both btsbot-tpu
orbax dirs and reference-style torch .pth checkpoints (the contract of
architectures.py:322-354)."""

import json
import os

import numpy as np
import torch

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.engine.checkpoint import save_model_variables
from btsbot_tpu.interop.export import variables_to_torch_state_dict
from btsbot_tpu.models.fusion import load_fusion_branches

META_COLS = [f"m{i}" for i in range(25)]

IMAGE_CFG = {
    "model_name": "um_cnn",
    "train_data_version": "vt",
    "metadata_cols": [],
    "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 3,
    "conv_dropout1": 0.1, "conv_dropout2": 0.1,
    "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.2,
}
META_CFG = {
    "model_name": "um_nn",
    "train_data_version": "vt",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
}


def _fusion_config(image_dir, meta_dir):
    return normalize_config({
        "model_name": "frozen_fusion",
        "metadata_cols": META_COLS,
        "image_model_config": IMAGE_CFG,
        "meta_model_config": META_CFG,
        "image_model_dir": image_dir,
        "meta_model_dir": meta_dir,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
    })


def test_load_branches_from_orbax_checkpoints(tmp_path):
    img_cfg = normalize_config(IMAGE_CFG)
    meta_cfg = normalize_config(META_CFG)
    _, img_vars = init_model(img_cfg, rng=10)
    _, meta_vars = init_model(meta_cfg, rng=11)

    img_dir = str(tmp_path / "img")
    meta_dir = str(tmp_path / "meta")
    save_model_variables(os.path.join(img_dir, "best"), img_vars["params"],
                         img_vars.get("batch_stats", {}))
    save_model_variables(os.path.join(meta_dir, "best"), meta_vars["params"],
                         meta_vars.get("batch_stats", {}))

    config = _fusion_config(img_dir, meta_dir)
    model, fusion_vars = init_model(config, rng=0)
    loaded = load_fusion_branches(config, fusion_vars)

    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["image_branch"]["backbone"]["conv1a"]
                   ["kernel"]),
        np.asarray(img_vars["params"]["backbone"]["conv1a"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["meta_branch"]["fc1"]["kernel"]),
        np.asarray(meta_vars["params"]["branch"]["fc1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["meta_branch"]["bn"]["mean"]),
        np.asarray(meta_vars["batch_stats"]["branch"]["bn"]["mean"]))

    out = model.apply(loaded, image_input=jnp.ones((2, 63, 63, 3)),
                      metadata_input=jnp.ones((2, 25)), train=False)
    assert out.shape == (2, 1)


def test_load_branches_from_torch_pth(tmp_path):
    """Reference-style model dirs: report.json + best_model.pth."""
    img_cfg = normalize_config(IMAGE_CFG)
    meta_cfg = normalize_config(META_CFG)
    _, img_vars = init_model(img_cfg, rng=20)
    _, meta_vars = init_model(meta_cfg, rng=21)

    for cfg, variables, d in ((img_cfg, img_vars, tmp_path / "img"),
                              (meta_cfg, meta_vars, tmp_path / "meta")):
        os.makedirs(d, exist_ok=True)
        sd = variables_to_torch_state_dict(cfg, variables)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, d / "best_model.pth")
        with open(d / "report.json", "w") as f:
            json.dump({"train_config": dict(cfg)}, f)

    # config without inline branch configs: resolved from report.json
    config = normalize_config({
        "model_name": "frozen_fusion",
        "metadata_cols": META_COLS,
        "image_model_dir": str(tmp_path / "img"),
        "meta_model_dir": str(tmp_path / "meta"),
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
    })
    model, fusion_vars = init_model(config, rng=0)
    loaded = load_fusion_branches(config, fusion_vars)

    np.testing.assert_allclose(
        np.asarray(loaded["params"]["image_branch"]["backbone"]["conv1a"]
                   ["kernel"]),
        np.asarray(img_vars["params"]["backbone"]["conv1a"]["kernel"]),
        rtol=1e-6)
    out = model.apply(loaded, image_input=jnp.ones((2, 63, 63, 3)),
                      metadata_input=jnp.ones((2, 25)), train=False)
    assert np.all(np.isfinite(np.asarray(out)))
