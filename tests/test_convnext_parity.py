"""ConvNeXt parity: timm-style torch oracle vs the flax backbone, through the
checkpoint converter (BASELINE.md configs 2 and 3)."""

import numpy as np
import torch

import jax.numpy as jnp

from btsbot_tpu import build_model, normalize_config, torch_state_dict_to_variables
from torch_mirrors import TorchConvNeXtClassifier, TorchMmConvNeXt

META_COLS = [f"m{i}" for i in range(25)]

BASE_CFG = {
    "model_kind": "convnext_pico.d1_in1k",
    "train_data_version": "v10",
    "metadata_cols": META_COLS,
    "fc1_neurons": 64,
    "fc2_neurons": 16,
    "dropout": 0.4,
    "meta_fc1_neurons": 128,
    "meta_fc2_neurons": 128,
    "meta_dropout": 0.25,
    "comb_fc1_neurons": 8,
    "comb_fc2_neurons": 8,
    "comb_dropout": 0.2,
}


def _rand_inputs(seed=1, n=3, size=63):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, size, size, 3)).astype(np.float32)
    meta = rng.normal(size=(n, 25)).astype(np.float32)
    return img, meta


def test_convnext_image_only_parity():
    config = normalize_config({**BASE_CFG, "model_name": "ConvNeXt"})
    torch.manual_seed(7)
    oracle = TorchConvNeXtClassifier(dict(config)).eval()

    img, _ = _rand_inputs()
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)
    got = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_mm_convnext_parity():
    config = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt"})
    torch.manual_seed(8)
    oracle = TorchMmConvNeXt(dict(config)).eval()
    from torch_mirrors import randomize_bn_stats
    randomize_bn_stats(oracle, seed=5)

    img, meta = _rand_inputs(seed=2)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)
    got = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dwconv_dense_lowering_matches_depthwise():
    """`dwconv_dense: true` re-lowers every block's 7x7 depthwise conv as a
    diagonal-expanded dense conv (models/convnext.py::DWConvDense, a
    measured serving optimization — docs/dwconv_dense_experiment.json).
    Contract: the param tree is bit-identical to the depthwise form (same
    paths, shapes, AND init values — checkpoints interchange freely) and
    the forward pass matches on the same weights."""
    from btsbot_tpu import init_model

    config_dw = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt"})
    config_dd = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt",
                                  "dwconv_dense": True})
    model_dw, v_dw = init_model(config_dw, rng=0)
    model_dd, v_dd = init_model(config_dd, rng=0)

    import jax.tree_util as tu
    paths_dw = tu.tree_leaves_with_path(v_dw)
    paths_dd = tu.tree_leaves_with_path(v_dd)
    assert [p for p, _ in paths_dw] == [p for p, _ in paths_dd]
    for (path, a), (_, b) in zip(paths_dw, paths_dd):
        assert a.shape == b.shape, path
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))

    img, meta = _rand_inputs(seed=3)
    want = np.asarray(model_dw.apply(
        v_dw, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    # the depthwise-form weights through the dense lowering
    got = np.asarray(model_dd.apply(
        v_dw, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

def test_dwconv_dense_guards():
    """Serving-only-knob guards (ADVICE r4): dwconv_dense warns on an f32
    compute dtype (breaks the TPU f32 bit-parity invariant), warns-and-
    ignores under the InceptionNeXt mixer (no 7x7 dwconv to re-lower), and
    is capped at DWCONV_DENSE_MAX_DIM channels (HBM cost of the diagonal
    (7,7,C,C) expansion at large widths)."""
    import warnings as _w

    import pytest

    from btsbot_tpu import init_model
    from btsbot_tpu.models import convnext as cx

    cfg_f32 = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt",
                                "dwconv_dense": True})
    with pytest.warns(UserWarning, match="bit-parity"):
        init_model(cfg_f32, rng=0)

    cfg_inc = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt",
                                "model_kind": "inceptionnext_pico",
                                "dwconv_dense": True})
    with pytest.warns(UserWarning, match="no effect"):
        model, variables = init_model(cfg_inc, rng=0, dtype=jnp.bfloat16)
    assert not any("DWConvDense" in str(p) for p in
                   [k for k, _ in __import__("jax").tree_util
                    .tree_leaves_with_path(variables)])

    # bf16 + dwconv form: no warning
    cfg_bf16 = normalize_config({**BASE_CFG, "model_name": "mm_ConvNeXt",
                                 "dwconv_dense": True})
    with _w.catch_warnings():
        _w.simplefilter("error")
        init_model(cfg_bf16, rng=0, dtype=jnp.bfloat16)

    # width cap: backbone drops the lowering above DWCONV_DENSE_MAX_DIM
    bb = cx._backbone_from_config(
        {**cfg_bf16, "model_kind": "convnext_base.fb_in1k"}, jnp.bfloat16)
    assert bb.dwconv_dense  # flag carried; per-stage gate applies the cap
    assert cx.DWCONV_DENSE_MAX_DIM == 512
