"""Pallas kernel correctness in interpreter mode (CPU).

The fused ConvNeXt block must match the pure-jnp reference (which itself is
covered by the ConvNeXt torch-parity tests) including the spatial-padding
path and the custom-VJP gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu.ops.pallas_convnext import (
    _block_reference,
    block_params_apply,
    convnext_block_fused,
)


def _params(c, rng):
    return dict(
        dw=jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.float32),
        dwb=jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        lns=jnp.asarray(1 + rng.normal(size=(c,)) * 0.1, jnp.float32),
        lnb=jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.normal(size=(4 * c,)) * 0.05, jnp.float32),
        w2=jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32),
        gamma=jnp.asarray(rng.normal(size=(c,)) * 0.5, jnp.float32),
    )


@pytest.mark.parametrize("shape", [(4, 15, 15, 8), (4, 8, 8, 8),
                                   (2, 7, 7, 16)])
def test_fused_block_matches_reference(shape):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    p = _params(c, rng)
    args = (x, p["dw"], p["dwb"], p["lns"], p["lnb"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["gamma"])
    ref = _block_reference(*args)
    out = convnext_block_fused(*args, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_gradients_match_reference():
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 8, 8, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    p = _params(c, rng)
    args = (x, p["dw"], p["dwb"], p["lns"], p["lnb"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["gamma"])

    def loss_fused(*a):
        return jnp.sum(jnp.square(convnext_block_fused(*a, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(_block_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_block_params_apply_matches_flax_block():
    from btsbot_tpu.models.convnext import ConvNeXtBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 15, 15, 8)), jnp.float32)
    block = ConvNeXtBlock(dim=8)
    variables = block.init(jax.random.key(0), x)
    expected = block.apply(variables, x)
    got = block_params_apply(variables["params"], x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_mlp_matches_reference():
    from btsbot_tpu.ops.pallas_mlp import _mlp_reference, fused_ln_mlp

    rng = np.random.default_rng(3)
    m, c = 50, 8  # non-multiple of tile → exercises row padding
    h = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    lns = jnp.asarray(1 + rng.normal(size=(c,)) * 0.1, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.5, jnp.float32)

    ref = _mlp_reference(h, res, lns, lnb, w1, b1, w2, b2, g)
    out = fused_ln_mlp(h, res, lns, lnb, w1, b1, w2, b2, g, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradients via the custom VJP
    args = (h, res, lns, lnb, w1, b1, w2, b2, g)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.square(
        fused_ln_mlp(*a, True))), argnums=tuple(range(9)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.square(
        _mlp_reference(*a))), argnums=tuple(range(9)))(*args)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_fast_mm_convnext_matches_flax():
    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.ops.pallas_mlp import fast_mm_convnext_logits

    config = normalize_config({
        "model_name": "mm_ConvNeXt",
        "model_kind": "convnext_atto.test",
        "train_data_version": "v12",
        "metadata_cols": [f"m{i}" for i in range(25)],
        "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.2,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
    })
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(3, 63, 63, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(3, 25)), jnp.float32)
    ref = np.asarray(model.apply(variables, image_input=img,
                                 metadata_input=meta, train=False)).reshape(-1)
    fast = np.asarray(fast_mm_convnext_logits(variables, img, meta, config,
                                              interpret=True))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-5)
