"""int8 quantized serving path: calibration structure + score parity vs the
exact model on a small ConvNeXt (CPU)."""

import numpy as np

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.ops.quantized import (
    prepare_quantized,
    quantized_convnext_logits,
    quantize_weight,
    verify_quantized_parity,
)

CFG = {
    "model_name": "mm_ConvNeXt",
    "model_kind": "convnext_atto.test",
    "train_data_version": "v12",
    "metadata_cols": [f"m{i}" for i in range(25)],
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.2,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
}


def _unit_triplets(rng, n):
    img = rng.normal(size=(n, 63, 63, 3)).astype(np.float32)
    return img / np.linalg.norm(img, axis=(1, 2), keepdims=True)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    wq, ws = quantize_weight(w, (0,))
    assert wq.dtype == jnp.int8 and ws.shape == (64,)
    deq = wq.astype(jnp.float32) * ws
    # max quantization error is half a step per channel
    err = np.max(np.abs(np.asarray(deq - w)), axis=0)
    step = np.asarray(ws)
    assert np.all(err <= step * 0.5 + 1e-7)


def test_quantized_scores_close_to_exact():
    config = normalize_config(CFG)
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(1)

    cal = jnp.asarray(_unit_triplets(rng, 64))
    q = prepare_quantized(variables, config, cal)
    assert "s0b0_x" in q["scales"] and "stem" in q["weights"]
    assert q["weights"]["s0b0_fc1"][0].dtype == jnp.int8

    test_img = jnp.asarray(_unit_triplets(rng, 16))
    test_meta = jnp.asarray(rng.normal(size=(16, 25)).astype(np.float32))
    parity = verify_quantized_parity(q, test_img, test_meta, tol=0.05)
    assert parity["close"], parity

    logits = quantized_convnext_logits(q, test_img, test_meta)
    assert logits.shape == (16,)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_quantized_image_only_convnext():
    config = normalize_config({**CFG, "model_name": "ConvNeXt",
                               "fc1_neurons": 16, "fc2_neurons": 8,
                               "dropout": 0.2})
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(2)
    cal = jnp.asarray(_unit_triplets(rng, 32))
    q = prepare_quantized(variables, config, cal)
    test_img = jnp.asarray(_unit_triplets(rng, 8))
    parity = verify_quantized_parity(q, test_img, None, tol=0.05)
    assert parity["close"], parity
