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


def test_fusion_branches_respect_model_kind(tmp_path, monkeypatch):
    """The fusion image branch must build the SAME backbone the standalone
    model builds — inceptionnext kinds keep their token mixer + mlp_ratio
    and non-224 MaxViT kinds their window — or a trained branch checkpoint
    cannot graft (caught in the r3 review pass: fusion rebuilt backbones
    from depths/dims only)."""
    import btsbot_tpu.models.maxvit as maxvit_mod

    monkeypatch.setitem(
        maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny",
        {"depths": (1, 1), "dims": (32, 64), "stem_width": 32})

    for image_cfg in (
        {"model_name": "ConvNeXt", "train_data_version": "vt",
         "metadata_cols": [], "model_kind": "inceptionnext_pico.r2",
         "fc1_neurons": 8, "fc2_neurons": 8, "dropout": 0.2},
        {"model_name": "MaxViT", "train_data_version": "vt",
         "metadata_cols": [], "model_kind": "maxvit_tiny_rw_96.test",
         "fc1_neurons": 8, "fc2_neurons": 8, "dropout": 0.2},
    ):
        img_cfg = normalize_config(image_cfg)
        _, img_vars = init_model(img_cfg, rng=3)
        img_dir = str(tmp_path / f"img_{image_cfg['model_name']}")
        meta_dir = str(tmp_path / f"meta_{image_cfg['model_name']}")
        save_model_variables(os.path.join(img_dir, "best"),
                             img_vars["params"],
                             img_vars.get("batch_stats", {}))
        meta_cfg = normalize_config(META_CFG)
        _, meta_vars = init_model(meta_cfg, rng=4)
        save_model_variables(os.path.join(meta_dir, "best"),
                             meta_vars["params"],
                             meta_vars.get("batch_stats", {}))

        config = normalize_config({
            "model_name": "frozen_fusion", "metadata_cols": META_COLS,
            "image_model_config": image_cfg, "meta_model_config": META_CFG,
            "image_model_dir": img_dir, "meta_model_dir": meta_dir,
            "comb_fc1_neurons": 8, "comb_fc2_neurons": 8,
            "comb_dropout": 0.2})
        model, fusion_vars = init_model(config, rng=0)
        loaded = load_fusion_branches(config, fusion_vars)
        # exact graft: the fusion branch tree matches the standalone tree
        got = loaded["params"]["image_branch"]["backbone"]
        want = img_vars["params"]["backbone"]
        import jax
        for (pa, va), (pb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(want),
                jax.tree_util.tree_leaves_with_path(got)):
            assert pa == pb, (pa, pb)
            np.testing.assert_array_equal(np.asarray(vb), np.asarray(va))
        out = model.apply(loaded, image_input=jnp.ones((2, 63, 63, 3)),
                          metadata_input=jnp.ones((2, 25)), train=False)
        assert out.shape == (2, 1) and np.all(np.isfinite(np.asarray(out)))


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
