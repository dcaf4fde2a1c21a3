"""End-to-end packet-stream serving: raw gzip+FITS blobs → scores, through
the native decoder + device ingest + model, vs a manual pipeline."""

import gzip

import numpy as np

import jax
import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.fits import write_fits_image
from btsbot_tpu.engine.serve import AlertStreamScorer
from btsbot_tpu.ops.preprocess import preprocess_triplets
from test_engine import SMALL_CFG


def _packet(rng, corrupt=False):
    p = {"candidate": {f"m{i}": float(rng.normal()) for i in range(25)}}
    for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
        data = rng.normal(size=(63, 63)).astype(np.float32)
        if corrupt and key == "cutoutScience":
            data[:] = np.nan
        p[key] = {"stampData": gzip.compress(write_fits_image(data))}
    return p


def test_stream_scorer_end_to_end():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)

    rng = np.random.default_rng(0)
    packets = [_packet(rng) for _ in range(9)]
    packets.insert(4, _packet(rng, corrupt=True))

    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    scores, drop = scorer(packets)
    assert scores.shape == (10,) and drop.shape == (10,)
    assert drop[4] and np.isnan(scores[4])
    assert not drop[[0, 1, 2, 3, 5, 6, 7, 8, 9]].any()
    assert np.all(np.isfinite(scores[~drop]))

    # cross-check one packet against the manual pipeline
    from btsbot_tpu.data.alerts import triplet_from_packet

    trip = triplet_from_packet(packets[0])[None]
    proc, _ = preprocess_triplets(jnp.asarray(trip))
    meta = np.asarray([[packets[0]["candidate"][f"m{i}"]
                        for i in range(25)]], np.float32)
    logits = model.apply(variables, image_input=proc,
                         metadata_input=jnp.asarray(meta), train=False)
    expected = float(jax.nn.sigmoid(logits.reshape(-1))[0])
    np.testing.assert_allclose(scores[0], expected, rtol=1e-5, atol=1e-6)


def test_bf16_training_config(tmp_path):
    """compute_dtype=bfloat16 trains and converges on the toy problem."""
    from btsbot_tpu.engine.train import run_training
    from test_engine import synthetic_dataset

    config = normalize_config({**SMALL_CFG, "epochs": 3,
                               "compute_dtype": "bfloat16",
                               "learning_rate": 2e-3})
    result = run_training(
        config, run_name="bf16", out_root=str(tmp_path),
        train_ds=synthetic_dataset(256, seed=0),
        val_ds=synthetic_dataset(96, seed=1),
        make_figure=False, log=lambda *_: None)
    assert result["history"]["val_accuracy"][-1] > 0.75
