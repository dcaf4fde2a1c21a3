"""Torch-default initialization (models/init.py + factory init_scheme).

The reference trains from torch module defaults (kaiming_uniform(a=√5)
kernels, U(±1/√fan_in) biases); our factory redraws flax's init to match by
default because the difference is measurable in trained quality
(docs/trainer_parity.json, models/init.py docstring).
"""

import numpy as np
import pytest

MM_CNN = {
    "model_name": "mm_cnn", "train_data_version": "v",
    "metadata_cols": ["a", "b", "c"],
    "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
    "conv_dropout1": 0.5, "conv_dropout2": 0.55,
    "meta_fc1_neurons": 128, "meta_fc2_neurons": 128, "meta_dropout": 0.3,
    "comb_fc1_neurons": 256, "comb_fc2_neurons": 32, "comb_dropout": 0.4,
}

CONVNEXT = {
    "model_name": "ConvNeXt", "model_kind": "convnext_atto",
    "train_data_version": "v", "pretrained": False,
    "fc1_neurons": 64, "fc2_neurons": 16, "dropout": 0.4,
}


def _flat(params, prefix=""):
    for k, v in params.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flat(v, path)
        else:
            yield path, np.asarray(v)


def test_torch_init_matches_torch_layer_statistics():
    """Every kernel/bias leaf is U(±1/√fan_in): exact bound respected, std
    matches the uniform's b/√3 — the closed form of torch's
    kaiming_uniform(a=√5) for any fan_in."""
    from btsbot_tpu.models.factory import init_model

    _, variables = init_model(MM_CNN, rng=0)
    checked = 0
    flat = dict(_flat(variables["params"]))
    for path, kernel in flat.items():
        if not path.endswith("/kernel"):
            continue
        bound = 1.0 / np.sqrt(np.prod(kernel.shape[:-1]))
        assert np.abs(kernel).max() <= bound, path
        # enough elements in every layer here for a ±15% std check
        assert np.isclose(kernel.std(), bound / np.sqrt(3), rtol=0.15), path
        bias = flat[path.replace("/kernel", "/bias")]
        assert np.abs(bias).max() <= bound, path
        assert np.any(bias != 0.0), path  # torch biases are nonzero
        checked += 1
    assert checked >= 6  # 4 convs + >=2 dense layers


def test_torch_init_is_deterministic_and_seed_sensitive():
    from btsbot_tpu.models.factory import init_model

    _, v1 = init_model(MM_CNN, rng=3)
    _, v2 = init_model(MM_CNN, rng=3)
    _, v3 = init_model(MM_CNN, rng=4)
    k = "backbone"
    a = np.asarray(v1["params"][k]["conv1a"]["kernel"])
    assert (a == np.asarray(v2["params"][k]["conv1a"]["kernel"])).all()
    assert (a != np.asarray(v3["params"][k]["conv1a"]["kernel"])).any()


def test_flax_scheme_restores_old_behavior():
    from btsbot_tpu.models.factory import init_model

    _, variables = init_model({**MM_CNN, "init_scheme": "flax"}, rng=0)
    for path, leaf in _flat(variables["params"]):
        if path.endswith("/bias"):
            assert (leaf == 0.0).all(), path


def test_unknown_scheme_rejected():
    from btsbot_tpu.models.factory import init_model

    with pytest.raises(ValueError, match="init_scheme"):
        init_model({**MM_CNN, "init_scheme": "he"}, rng=0)


def test_specialty_params_keep_architecture_defaults():
    """LayerNorm scales stay 1 and layer-scale γ stays 1e-6 — the redraw
    touches only kernel/bias pairs (norm bias has no kernel sibling)."""
    from btsbot_tpu.models.factory import init_model

    _, variables = init_model(CONVNEXT, rng=0)
    saw_gamma = saw_scale = False
    for path, leaf in _flat(variables["params"]):
        if path.endswith("/gamma"):
            assert np.allclose(leaf, 1e-6), path
            saw_gamma = True
        if path.endswith("/scale"):
            assert (leaf == 1.0).all(), path
            saw_scale = True
    assert saw_gamma and saw_scale
