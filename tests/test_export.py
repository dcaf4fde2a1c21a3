"""Export path: JAX→torch state dict round trips and cross-runtime parity
(the replacement for to_onnx's verify harness)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from btsbot_tpu import (
    build_model,
    init_model,
    normalize_config,
    torch_state_dict_to_variables,
)
from btsbot_tpu.interop.export import variables_to_torch_state_dict
from test_cnn_parity import CNN_CFG, _rand_inputs
from torch_mirrors import (
    TorchConvNeXtClassifier,
    TorchMmCnn,
    TorchMmConvNeXt,
    TorchUmCnn,
    TorchUmNN,
    randomize_bn_stats,
)

CONVNEXT_CFG = {
    **CNN_CFG,
    "model_kind": "convnext_pico.d1_in1k",
}


@pytest.mark.parametrize("model_name", [
    "mm_cnn", "um_cnn", "um_nn", "ConvNeXt", "mm_ConvNeXt",
])
def test_roundtrip_torch_jax_torch(model_name):
    """torch sd → JAX variables → torch sd is the identity."""
    config = normalize_config({**CONVNEXT_CFG, "model_name": model_name})
    torch.manual_seed(11)
    cls = {"mm_cnn": TorchMmCnn, "um_cnn": TorchUmCnn, "um_nn": TorchUmNN,
           "ConvNeXt": TorchConvNeXtClassifier,
           "mm_ConvNeXt": TorchMmConvNeXt}[model_name]
    oracle = cls(dict(config)).eval()
    randomize_bn_stats(oracle, seed=7)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}

    variables = torch_state_dict_to_variables(config, sd)
    sd2 = variables_to_torch_state_dict(config, variables)
    for k, v in sd.items():
        np.testing.assert_array_equal(sd2[k], v, err_msg=k)


def test_export_loads_into_torch_and_matches_jax():
    """A freshly initialized JAX model exports to a state dict that loads
    into the torch oracle and reproduces the JAX forward pass."""
    config = normalize_config({**CNN_CFG, "model_name": "mm_cnn"})
    model, variables = init_model(config, rng=3)

    sd = variables_to_torch_state_dict(config, variables)
    oracle = TorchMmCnn(dict(config))
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = oracle.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing) or not missing
    oracle.eval()

    img, meta = _rand_inputs(seed=9)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()
    got = np.asarray(model.apply(variables, image_input=jnp.asarray(img),
                                 metadata_input=jnp.asarray(meta),
                                 train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_publish_helpers():
    from btsbot_tpu.interop.publish import (
        config_to_params,
        get_HF_basemodel,
    )

    cfg = {"model_name": "mm_ConvNeXt",
           "model_kind": "convnext_pico.d1_in1k"}
    assert config_to_params(cfg) == ("convnext", False, "imagenet")
    cfg2 = {"model_name": "ConvNeXt",
            "model_kind": "mwalmsley/zoobot-encoder-convnext_pico"}
    assert config_to_params(cfg2) == ("convnext", False, "galaxyzoo")
    cfg3 = {"model_name": "MaxViT",
            "model_kind": "maxvit_tiny_rw_224.sw_in1k", "pretrained": False}
    assert config_to_params(cfg3) == ("maxvit", False, "randinit")
    assert "zoobot" in get_HF_basemodel("convnext", "galaxyzoo")
    # TPU-native serving variants publish as from-scratch models
    cfg4 = {"model_name": "mm_ConvNeXt", "model_kind": "inceptionnext_pico.r2"}
    assert config_to_params(cfg4) == ("inceptionnext", False, "randinit")
    assert get_HF_basemodel("inceptionnext", "randinit") is None
    with pytest.raises(ValueError):
        get_HF_basemodel("resnet", "imagenet")


def test_convnext_export_torch_forward_parity():
    """f32 exported mm_ConvNeXt state dict, loaded into the torch oracle,
    reproduces the JAX forward at the reference tolerance (the deployment
    chain's numeric contract, to_onnx.py:135-137)."""
    config = normalize_config({**CONVNEXT_CFG, "model_name": "mm_ConvNeXt",
                               "model_kind": "convnext_atto.d2_in1k"})
    model, variables = init_model(config, rng=5)
    sd = variables_to_torch_state_dict(config, variables)
    oracle = TorchMmConvNeXt(dict(config), depths=(2, 2, 6, 2),
                             dims=(40, 80, 160, 320))
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = oracle.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)
    oracle.eval()

    img, meta = _rand_inputs(seed=13)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()
    got = np.asarray(model.apply(variables, image_input=jnp.asarray(img),
                                 metadata_input=jnp.asarray(meta),
                                 train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_maxvit_export_torch_forward_parity(monkeypatch):
    """Same contract for the MaxViT export path (round 1 only asserted key
    identity here)."""
    from btsbot_tpu.models import maxvit as maxvit_mod
    from torch_maxvit_mirror import TorchMmMaxViT

    tiny = {"depths": (1, 1), "dims": (32, 64), "stem_width": 32}
    monkeypatch.setitem(maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny", tiny)
    config = normalize_config({**CNN_CFG, "model_name": "mm_MaxViT",
                               "model_kind": "maxvit_tiny_rw_64.test"})
    model, variables = init_model(config, rng=6)
    sd = variables_to_torch_state_dict(config, variables)
    oracle = TorchMmMaxViT(dict(config), image_size=64, window=2, **tiny)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = oracle.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)
    oracle.eval()

    img, meta = _rand_inputs(seed=17)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()
    got = np.asarray(model.apply(variables, image_input=jnp.asarray(img),
                                 metadata_input=jnp.asarray(meta),
                                 train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
