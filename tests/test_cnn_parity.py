"""Converted-weight parity: torch oracle vs btsbot-tpu flax models.

Verifies the headline numerical contract (BASELINE.md: BTS-score parity
<1e-5) for the CNN/MLP family by round-tripping random torch checkpoints
through btsbot_tpu.interop.convert and comparing forward passes.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from btsbot_tpu import build_model, normalize_config, torch_state_dict_to_variables
from torch_mirrors import (
    TorchMmCnn, TorchUmCnn, TorchUmNN, randomize_bn_stats,
)

META_COLS = [f"m{i}" for i in range(25)]

CNN_CFG = {
    "train_data_version": "v10",
    "metadata_cols": META_COLS,
    "conv1_channels": 32,
    "conv2_channels": 64,
    "conv_kernel": 5,
    "conv_dropout1": 0.5,
    "conv_dropout2": 0.55,
    "meta_fc1_neurons": 128,
    "meta_fc2_neurons": 128,
    "meta_dropout": 0.25,
    "comb_fc_neurons": 8,
    "comb_dropout": 0.2,
    "fc1_neurons": 64,
    "fc2_neurons": 16,
    "dropout": 0.4,
}


def _rand_inputs(seed=0, n=7, image_size=63, n_meta=25):
    rng = np.random.default_rng(seed)
    img_nhwc = rng.normal(size=(n, image_size, image_size, 3)).astype(np.float32)
    meta = rng.normal(size=(n, n_meta)).astype(np.float32)
    return img_nhwc, meta


def _jax_scores(config, variables, img_nhwc, meta):
    model = build_model(config)
    out = model.apply(
        variables,
        image_input=None if img_nhwc is None else jnp.asarray(img_nhwc),
        metadata_input=None if meta is None else jnp.asarray(meta),
        train=False,
    )
    return np.asarray(out)


@pytest.mark.parametrize("model_name,torch_cls", [
    ("mm_cnn", TorchMmCnn),
    ("um_cnn", TorchUmCnn),
    ("um_nn", TorchUmNN),
])
def test_cnn_family_parity(model_name, torch_cls):
    config = normalize_config({**CNN_CFG, "model_name": model_name})
    torch.manual_seed(42)
    oracle = torch_cls(dict(config)).eval()
    randomize_bn_stats(oracle, seed=3)

    img, meta = _rand_inputs()
    img_nchw = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
    meta_t = torch.from_numpy(meta)

    with torch.no_grad():
        if model_name == "mm_cnn":
            expected = oracle(img_nchw, meta_t).numpy()
        elif model_name == "um_cnn":
            expected = oracle(img_nchw).numpy()
        else:
            expected = oracle(meta_t).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)

    got = _jax_scores(
        config, variables,
        img if config.need_triplets else None,
        meta if config.need_metadata else None,
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    # The production contract is on sigmoid scores (val.py:153): <1e-5.
    assert np.max(np.abs(jax.nn.sigmoid(got) -
                         1 / (1 + np.exp(-expected)))) < 1e-5


def test_dataparallel_prefix_stripped():
    config = normalize_config({**CNN_CFG, "model_name": "um_nn"})
    torch.manual_seed(0)
    oracle = TorchUmNN(dict(config)).eval()
    sd = {f"module.{k}": v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)
    _, meta = _rand_inputs()
    got = _jax_scores(config, variables, None, meta)
    with torch.no_grad():
        expected = oracle(torch.from_numpy(meta)).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
