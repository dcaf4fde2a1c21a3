"""TPU-native InceptionNeXt variant (decomposed token mixer, Yu et al. 2023):
spec resolution, forward shapes, export/convert round trip on our own key
naming, and ONNX deployment artifact.  The variant exists because the 7×7
depthwise conv is the measured serving bottleneck (docs/perf_sweep.json);
it is train-from-scratch (no timm checkpoint parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu import build_model, init_model, normalize_config, \
    torch_state_dict_to_variables
from btsbot_tpu.interop.export import variables_to_torch_state_dict
from btsbot_tpu.models.convnext import convnext_spec

META_COLS = [f"m{i}" for i in range(25)]

CFG = normalize_config({
    "model_name": "mm_ConvNeXt",
    "model_kind": "inceptionnext_atto.tpu",
    "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
})


def test_spec_resolution():
    spec = convnext_spec("inceptionnext_pico.tpu")
    assert spec["token_mixer"] == "inception"
    assert spec["dims"] == convnext_spec("convnext_pico.d1_in1k")["dims"]
    with pytest.raises(ValueError):
        convnext_spec("inceptionnext_gigantic")


def test_forward_and_param_structure():
    model, variables = init_model(CFG, rng=0)
    block = variables["params"]["backbone"]["stage0"]["block0"]
    assert "mixer" in block and "conv_dw" not in block
    assert block["mixer"]["dw_band_w"]["kernel"].shape == (1, 11, 1, 5)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 63, 63, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(2, 25)), jnp.float32)
    out = model.apply(variables, image_input=img, metadata_input=meta,
                      train=False)
    assert out.shape == (2, 1) and np.all(np.isfinite(out))


def test_export_convert_roundtrip():
    _, variables = init_model(CFG, rng=1)
    sd = variables_to_torch_state_dict(CFG, variables)
    assert any(".mixer.dw_square.weight" in k for k in sd)
    back = torch_state_dict_to_variables(CFG, sd)  # strict accounting
    flat1 = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(back["params"])}
    for k, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k))


def test_onnx_artifact_parity():
    import tempfile

    from btsbot_tpu.interop.onnx_export import export_and_verify_onnx

    _, variables = init_model(CFG, rng=2)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(3, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(3, 25)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        report = export_and_verify_onnx(
            CFG, variables, f"{d}/inext.onnx", triplets=img, metadata=meta)
    assert report["close"], report


def test_training_step_smoke():
    from btsbot_tpu.engine.state import create_train_state, make_optimizer
    from btsbot_tpu.engine.steps import make_train_step

    cfg = normalize_config({**CFG, "learning_rate": 1e-3, "beta_1": 0.9,
                            "beta_2": 0.999, "batch_size": 8, "epochs": 1,
                            "patience": 1, "random_seed": 0})
    model, variables = init_model(cfg, rng=0)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(cfg, variables, tx, seed=0)
    step = make_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    state, m = step(state,
                    jnp.asarray(rng.normal(size=(8, 63, 63, 3)), jnp.float32),
                    jnp.asarray(rng.normal(size=(8, 25)), jnp.float32),
                    jnp.asarray((rng.random(8) < 0.5), jnp.float32),
                    jnp.float32(1.0))
    assert np.isfinite(float(m["loss"]))


def test_mlp_ratio_knob():
    """'.r<k>' model_kind suffix shrinks the block MLP expansion — the
    measured serving knob (attribution study in docs/perf_sweep.json)."""
    spec = convnext_spec("inceptionnext_pico.r2")
    assert spec["mlp_ratio"] == 2 and spec["token_mixer"] == "inception"
    assert "mlp_ratio" not in convnext_spec("convnext_pico.d1_in1k")

    cfg = normalize_config({**CFG, "model_kind": "inceptionnext_atto.r2"})
    model, variables = init_model(cfg, rng=0)
    blk = variables["params"]["backbone"]["stage0"]["block0"]
    assert blk["mlp_fc1"]["kernel"].shape == (40, 80)  # 2x, not 4x

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 63, 63, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(2, 25)), jnp.float32)
    out = model.apply(variables, image_input=img, metadata_input=meta,
                      train=False)
    assert out.shape == (2, 1) and np.all(np.isfinite(out))

    # strict interop round trip holds at the narrower width
    sd = variables_to_torch_state_dict(cfg, variables)
    v2 = torch_state_dict_to_variables(cfg, sd)
    a = jax.tree_util.tree_leaves(variables["params"])
    b = jax.tree_util.tree_leaves(v2["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
