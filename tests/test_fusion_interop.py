"""frozen_fusion checkpoint interop: torch ↔ flax conversion parity, export
round trip, and ONNX artifact — completing the converter/exporter coverage
for the eighth model family (reference architectures.py:296-372)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from btsbot_tpu import build_model, normalize_config, \
    torch_state_dict_to_variables
from btsbot_tpu.interop.export import variables_to_torch_state_dict
from torch_mirrors import (
    GlobalAvgPool2d,
    LayerNorm2d,
    TimmStyleConvNeXt,
    TorchUmCnn,
    TorchUmNN,
    _head_stack,
    randomize_bn_stats,
)

META_COLS = [f"m{i}" for i in range(25)]

UM_CNN_CFG = {
    "model_name": "um_cnn", "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 5,
    "conv_dropout1": 0.1, "conv_dropout2": 0.1,
    "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.2,
}

UM_NN_CFG = {
    "model_name": "um_nn", "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
}

CONVNEXT_CFG = {
    "model_name": "ConvNeXt", "model_kind": "convnext_atto.d2_in1k",
    "train_data_version": "v12", "metadata_cols": META_COLS,
    "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.2,
}


class TorchFrozenFusion(nn.Module):
    """Reference frozen_fusion built exactly like architectures.py:296-372:
    branch models with heads stripped in place + fresh combined head."""

    def __init__(self, cfg, image_model, image_name, meta_model):
        super().__init__()
        if image_name == "um_cnn":
            emb = image_model.head[0].in_features
            image_model.head = nn.Identity()
        elif image_name == "ConvNeXt":
            image_model.convnext.head = nn.Sequential(
                *list(image_model.convnext.head.children())[0:3])
            emb = image_model.convnext.head[1].normalized_shape[0]
        else:
            raise ValueError(image_name)
        self.image_branch = image_model
        meta_model.network = nn.Sequential(
            *list(meta_model.network.children())[:-2])
        emb_meta = meta_model.network[-1].out_features
        self.meta_branch = meta_model
        self.combined_head = _head_stack(
            emb + emb_meta, cfg["comb_fc1_neurons"],
            cfg["comb_fc2_neurons"], cfg["comb_dropout"], nn.ReLU)

    def forward(self, image_input, metadata_input):
        feats = torch.cat([self.image_branch(image_input),
                           self.meta_branch(metadata_input)], dim=1)
        return self.combined_head(feats)


class TorchConvNeXtForFusion(nn.Module):
    """Image-only ConvNeXt with the reference attr naming (convnext.*)."""

    def __init__(self, cfg):
        super().__init__()
        self.convnext = TimmStyleConvNeXt((2, 2, 6, 2), (40, 80, 160, 320))
        self.convnext.head = nn.Sequential(
            GlobalAvgPool2d(), LayerNorm2d(320, eps=1e-6), nn.Flatten(1),
            nn.Linear(320, cfg["fc1_neurons"]), nn.GELU(),
            nn.Linear(cfg["fc1_neurons"], cfg["fc2_neurons"]), nn.GELU(),
            nn.Dropout(cfg["dropout"]), nn.Linear(cfg["fc2_neurons"], 1))

    def forward(self, x):
        return self.convnext.head(self.convnext(x))


def _fusion_config(image_cfg):
    return normalize_config({
        "model_name": "frozen_fusion",
        "train_data_version": "v12",
        "metadata_cols": META_COLS,
        "image_model_dir": "unused", "meta_model_dir": "unused",
        "image_model_config": image_cfg,
        "meta_model_config": UM_NN_CFG,
        "comb_fc1_neurons": 16, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
        "skip_load_state": True,
    })


def _rand_inputs(seed=0, n=3):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, 63, 63, 3)).astype(np.float32),
            rng.normal(size=(n, 25)).astype(np.float32))


def _build_oracle(image_cfg, seed):
    torch.manual_seed(seed)
    name = image_cfg["model_name"]
    if name == "um_cnn":
        image_model = TorchUmCnn(image_cfg)
    else:
        image_model = TorchConvNeXtForFusion(image_cfg)
    cfg = _fusion_config(image_cfg)
    oracle = TorchFrozenFusion(dict(cfg), image_model, name,
                               TorchUmNN(UM_NN_CFG)).eval()
    randomize_bn_stats(oracle, seed=seed + 1)
    return cfg, oracle


@pytest.mark.parametrize("image_cfg", [UM_CNN_CFG, CONVNEXT_CFG],
                         ids=["um_cnn", "ConvNeXt"])
def test_frozen_fusion_conversion_parity_and_roundtrip(image_cfg):
    cfg, oracle = _build_oracle(image_cfg, seed=41)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(cfg, sd)  # strict

    img, meta = _rand_inputs(seed=2)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()
    model = build_model(cfg)
    got = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    # export round trip is the identity
    sd2 = {k: v for k, v in
           variables_to_torch_state_dict(cfg, variables).items()
           if "num_batches_tracked" not in k}
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_frozen_fusion_onnx_artifact(tmp_path):
    from btsbot_tpu import init_model
    from btsbot_tpu.interop.onnx_export import export_and_verify_onnx

    cfg = _fusion_config(UM_CNN_CFG)
    _, variables = init_model(cfg, rng=0)
    img, meta = _rand_inputs(seed=3)
    report = export_and_verify_onnx(
        cfg, variables, str(tmp_path / "fusion.onnx"),
        triplets=img, metadata=meta)
    assert report["close"], report
