"""TF SavedModel deployment artifact: export via jax2tf, load back in
TensorFlow, verify against the native JAX f32 graph at the reference's
tolerance (to_onnx.py:135-137 — rtol 1e-4 / atol 1e-5)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.interop.savedmodel import export_and_verify

META_COLS = [f"m{i}" for i in range(25)]

MM_CNN_CFG = normalize_config({
    "model_name": "mm_cnn",
    "train_data_version": "vtest",
    "metadata_cols": META_COLS,
    "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 5,
    "conv_dropout1": 0.1, "conv_dropout2": 0.1,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
})

UM_NN_CFG = normalize_config({
    "model_name": "um_nn", "train_data_version": "vtest",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
})


def _data(n=9, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, 63, 63, 3)).astype(np.float32),
            rng.normal(size=(n, 25)).astype(np.float32))


def test_mm_cnn_saved_model_round_trip(tmp_path):
    _, variables = init_model(MM_CNN_CFG, rng=0)
    img, meta = _data()
    out = str(tmp_path / "sm")
    report = export_and_verify(MM_CNN_CFG, variables, out,
                               triplets=img, metadata=meta)
    assert report["close"], report
    assert report["max_diff"] < 1e-5
    assert (tmp_path / "sm" / "verification.json").exists()

    # dynamic batch axis: a different batch size through the same artifact
    loaded = tf.saved_model.load(out)
    img2, meta2 = _data(n=3, seed=1)
    got = loaded.logits(tf.constant(img2), tf.constant(meta2)).numpy()
    assert got.shape == (3,)

    # TF-Serving style named-signature call
    sig = loaded.signatures["serving_default"]
    named = sig(image=tf.constant(img2), metadata=tf.constant(meta2))
    np.testing.assert_allclose(named["logits"].numpy(), got, rtol=1e-6)


def test_metadata_only_saved_model(tmp_path):
    _, variables = init_model(UM_NN_CFG, rng=0)
    _, meta = _data()
    report = export_and_verify(UM_NN_CFG, variables, str(tmp_path / "sm"),
                               metadata=meta)
    assert report["close"], report
