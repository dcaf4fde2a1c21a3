"""Cross-framework parity on the reference's REAL example data.

Round 1's golden test used synthetic triplets scored by the same flax model
it checked.  Here the reference's actual 39-alert fixture
(`/root/reference/btsbot/example_data/usage_triplets.npy` + candidates CSV
— real ZTF cutout statistics, the data `expected_scores` was computed on)
drives both the torch oracle and the converted flax model, asserting
score agreement < 1e-5 end to end through the checkpoint converter on
real-distribution inputs.  (Bit-matching `expected_scores` itself needs the
real trained `pytorch_model.bin`, which requires network access — see
interop/manifests.py for the offline-closure plan.)

Skipped when the reference checkout is absent (e.g. in CI).
"""

import os

import numpy as np
import pytest

import jax

REF_DATA = "/root/reference/btsbot/example_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference example data not present")


@pytest.fixture(scope="module")
def real_alerts():
    import pandas as pd

    triplets = np.load(os.path.join(REF_DATA, "usage_triplets.npy"))
    cand = pd.read_csv(os.path.join(REF_DATA, "usage_candidates.csv"))
    assert triplets.shape == (39, 63, 63, 3)
    # match the reference's cast order: f64 fixture → f32 model input
    # (inference_example.py:62)
    return triplets.astype(np.float32), cand


METADATA_COLS = [
    "sgscore1", "distpsnr1", "sgscore2", "distpsnr2", "fwhm", "magpsf",
    "sigmapsf", "chipsf", "ra", "dec", "diffmaglim", "ndethist", "nmtchps",
    "age", "days_since_peak", "days_to_peak", "peakmag_so_far", "new_drb",
    "ncovhist", "nnotdet", "chinr", "sharpnr", "scorr", "sky",
    "maxmag_so_far",
]


def _parity_on_real_data(model_name, extra_cfg, oracle_factory, rtol=1e-4,
                         atol=1e-5):
    import torch

    import jax.numpy as jnp

    from btsbot_tpu import build_model, normalize_config, \
        torch_state_dict_to_variables
    from torch_mirrors import randomize_bn_stats

    config = normalize_config({
        "model_name": model_name,
        "train_data_version": "v10",
        "metadata_cols": METADATA_COLS,
        **extra_cfg,
    })
    torch.manual_seed(33)
    oracle = oracle_factory(dict(config)).eval()
    randomize_bn_stats(oracle, seed=12)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)
    return config, oracle, model, variables


def test_mm_cnn_parity_on_real_alerts(real_alerts):
    import torch

    import jax.numpy as jnp

    from torch_mirrors import TorchMmCnn

    triplets, cand = real_alerts
    meta = cand[METADATA_COLS].values.astype(np.float32)

    config, oracle, model, variables = _parity_on_real_data(
        "mm_cnn", {
            "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
            "conv_dropout1": 0.5, "conv_dropout2": 0.55,
            "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
            "meta_dropout": 0.3,
            "comb_fc1_neurons": 256, "comb_fc2_neurons": 32,
            "comb_dropout": 0.4,
        }, TorchMmCnn)

    with torch.no_grad():
        logits = oracle(
            torch.from_numpy(np.transpose(triplets, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta))
        expected = torch.sigmoid(logits.reshape(-1)).numpy()

    got = np.asarray(jax.nn.sigmoid(model.apply(
        variables, image_input=jnp.asarray(triplets),
        metadata_input=jnp.asarray(meta), train=False).reshape(-1)))
    assert got.shape == (39,)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_mm_convnext_parity_on_real_alerts(real_alerts):
    import torch

    import jax.numpy as jnp

    from torch_mirrors import TorchMmConvNeXt

    triplets, cand = real_alerts
    meta = cand[METADATA_COLS].values.astype(np.float32)

    config, oracle, model, variables = _parity_on_real_data(
        "mm_ConvNeXt", {
            "model_kind": "convnext_pico.d1_in1k",
            "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
            "meta_dropout": 0.25,
            "comb_fc1_neurons": 64, "comb_fc2_neurons": 32,
            "comb_dropout": 0.2,
        }, TorchMmConvNeXt)

    with torch.no_grad():
        logits = oracle(
            torch.from_numpy(np.transpose(triplets, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta))
        expected = torch.sigmoid(logits.reshape(-1)).numpy()

    got = np.asarray(jax.nn.sigmoid(model.apply(
        variables, image_input=jnp.asarray(triplets),
        metadata_input=jnp.asarray(meta), train=False).reshape(-1)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_onnx_artifact_on_real_alerts(real_alerts, tmp_path):
    """The emitted ONNX graph reproduces the JAX scores on the real fixture
    through the independent numpy runtime — deployment-chain parity on real
    data (to_onnx.py:110-143 equivalent)."""
    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.interop.onnx_export import export_and_verify_onnx

    triplets, cand = real_alerts
    meta = cand[METADATA_COLS].values.astype(np.float32)
    config = normalize_config({
        "model_name": "mm_cnn", "train_data_version": "v10",
        "metadata_cols": METADATA_COLS,
        "conv1_channels": 16, "conv2_channels": 16, "conv_kernel": 5,
        "conv_dropout1": 0.5, "conv_dropout2": 0.55,
        "meta_fc1_neurons": 32, "meta_fc2_neurons": 32, "meta_dropout": 0.3,
        "comb_fc1_neurons": 32, "comb_fc2_neurons": 16, "comb_dropout": 0.4,
    })
    _, variables = init_model(config, rng=1)
    report = export_and_verify_onnx(
        config, variables, str(tmp_path / "real.onnx"),
        triplets=triplets, metadata=meta)
    assert report["close"], report
    assert report["n"] == 39
