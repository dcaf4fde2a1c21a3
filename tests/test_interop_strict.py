"""Strict conversion accounting + vendored timm checkpoint manifests.

Covers the unexpected-key half of the reference's
``load_state_dict(strict=True)`` contract (from_HF.py:79) that round 1
lacked: converters must refuse to half-load a checkpoint with keys they
don't consume, and the vendored manifests (interop/manifests/*.json) must
stay pinned to both the converter's expectations and the flax model trees
at the FULL production specs (convnext_pico, maxvit_tiny @ 224 / window 7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu import normalize_config, torch_state_dict_to_variables
from btsbot_tpu.interop.convert import (
    UnconsumedKeysError,
    _convnext_backbone_params,
    conversion_manifest,
)
from btsbot_tpu.interop.manifests import (
    expected_checkpoint_manifest,
    load_manifest,
    validate_state_dict,
)
from btsbot_tpu.interop.maxvit_convert import maxvit_backbone_to_flax
from btsbot_tpu.models.convnext import ConvNeXtBackbone, convnext_spec
from btsbot_tpu.models.maxvit import MaxViTBackbone, maxvit_spec

META_COLS = [f"m{i}" for i in range(25)]

MM_CNN_CFG = normalize_config({
    "model_name": "mm_cnn",
    "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 5,
    "conv_dropout1": 0.1, "conv_dropout2": 0.1,
    "meta_fc1_neurons": 8, "meta_fc2_neurons": 8, "meta_dropout": 0.1,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
})


def _mm_cnn_state_dict():
    from torch_mirrors import TorchMmCnn
    import torch
    torch.manual_seed(0)
    oracle = TorchMmCnn(dict(MM_CNN_CFG)).eval()
    return {k: v.numpy() for k, v in oracle.state_dict().items()}


def test_strict_mode_rejects_unconsumed_keys():
    sd = _mm_cnn_state_dict()
    sd["rw_variant_extra.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(UnconsumedKeysError, match="rw_variant_extra.weight"):
        torch_state_dict_to_variables(MM_CNN_CFG, sd)
    # strict=False half-loads (documented escape hatch)
    variables = torch_state_dict_to_variables(MM_CNN_CFG, sd, strict=False)
    assert "params" in variables


def test_strict_mode_ignores_torch_bookkeeping():
    sd = _mm_cnn_state_dict()
    assert any(k.endswith("num_batches_tracked") for k in sd)
    variables = torch_state_dict_to_variables(MM_CNN_CFG, sd)  # no raise
    assert "batch_stats" in variables


def test_conversion_manifest_accounting():
    sd = _mm_cnn_state_dict()
    sd["extra.bias"] = np.zeros(3, np.float32)
    report = conversion_manifest(MM_CNN_CFG, sd)
    assert report["unconsumed"] == ["extra.bias"]
    assert all(k.endswith("num_batches_tracked") for k in report["ignored"])
    assert set(report["consumed"]) | set(report["ignored"]) | {"extra.bias"} \
        == set(sd)


@pytest.mark.parametrize("model_kind", ["convnext_pico.d1_in1k",
                                        "maxvit_tiny_rw_224.sw_in1k"])
def test_vendored_manifest_matches_generator(model_kind):
    assert load_manifest(model_kind) == \
        expected_checkpoint_manifest(model_kind)


def _zeros_sd(manifest):
    return {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(int(d) for d in x.shape), tree)


def test_convnext_pico_manifest_matches_flax_tree():
    """Full-spec convnext_pico: every backbone manifest key converts, and
    the converted tree's shapes equal the flax ConvNeXtBackbone init tree."""
    model_kind = "convnext_pico.d1_in1k"
    manifest = expected_checkpoint_manifest(model_kind, num_classes=None)
    sd = _zeros_sd(manifest)
    params = _convnext_backbone_params(sd, "", model_kind)

    spec = convnext_spec(model_kind)
    backbone = ConvNeXtBackbone(depths=spec["depths"], dims=spec["dims"])
    shapes = jax.eval_shape(
        backbone.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 63, 63, 3), jnp.float32))
    # manifest head.norm maps onto the wrapper's head_norm, not the backbone
    want = _tree_shapes(shapes["params"])
    got = _tree_shapes(params)
    got.pop("head_norm", None)
    assert got == want


def test_maxvit_tiny_224_manifest_matches_flax_tree():
    """Full-spec maxvit_tiny @ 224 (depths (2,2,5,2), window 7): manifest →
    converter → tree shapes equal the flax MaxViTBackbone init tree, and the
    conversion consumes every non-head manifest key."""
    model_kind = "maxvit_tiny_rw_224.sw_in1k"
    manifest = expected_checkpoint_manifest(model_kind, num_classes=None)
    sd = _zeros_sd(manifest)
    sd.pop("head.norm.weight"), sd.pop("head.norm.bias")
    params, stats = maxvit_backbone_to_flax(sd, "", model_kind)

    spec = maxvit_spec(model_kind)
    backbone = MaxViTBackbone(depths=spec["depths"], dims=spec["dims"],
                              stem_width=spec["stem_width"], window=7)
    shapes = jax.eval_shape(
        backbone.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert _tree_shapes(params) == _tree_shapes(shapes["params"])
    assert _tree_shapes(stats) == _tree_shapes(shapes["batch_stats"])


def test_validate_state_dict_reports_drift():
    model_kind = "convnext_pico.d1_in1k"
    sd = _zeros_sd(expected_checkpoint_manifest(model_kind))
    assert validate_state_dict(sd, model_kind)["ok"]

    bad = dict(sd)
    bad.pop("stem.0.weight")
    bad["stages.9.novel.weight"] = np.zeros(2, np.float32)
    bad["stem.1.weight"] = np.zeros(7, np.float32)
    report = validate_state_dict(bad, model_kind)
    assert report["missing"] == ["stem.0.weight"]
    assert report["unexpected"] == ["stages.9.novel.weight"]
    assert report["mismatched"] == [("stem.1.weight", (7,), (64,))]
    assert not report["ok"]

    # backbone-only distributions (zoobot encoders) validate without a head
    no_head = {k: v for k, v in sd.items() if not k.startswith("head.")}
    assert validate_state_dict(no_head, model_kind, num_classes=None)["ok"]
