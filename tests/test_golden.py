"""Golden-score regression: the shipped example data's expected_scores
column must be reproduced to <1e-5 (the SURVEY.md §4 parity mechanism,
mirroring the reference's example_data fixture)."""

import json
import os

import numpy as np
import pandas as pd

import flax.serialization
import jax
import jax.numpy as jnp

from btsbot_tpu import build_model, init_model, normalize_config

EXAMPLE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "btsbot_tpu", "example_data")


def _load_example():
    with open(os.path.join(EXAMPLE_DIR, "train_config.json")) as f:
        config = normalize_config(json.load(f))
    trips = np.load(os.path.join(EXAMPLE_DIR, "usage_triplets.npy"))
    cand = pd.read_csv(os.path.join(EXAMPLE_DIR, "usage_candidates.csv"))
    model, template = init_model(config, rng=0)
    with open(os.path.join(EXAMPLE_DIR, "params.msgpack"), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    return config, model, variables, trips, cand


def test_golden_scores_parity():
    config, model, variables, trips, cand = _load_example()
    meta = cand[config["metadata_cols"]].to_numpy().astype(np.float32)
    # f64 stored triplets cast to f32 at load — same cast order as the
    # reference pipeline (inference_example.py:62)
    imgs = jnp.asarray(trips.astype(np.float32))
    logits = model.apply(variables, image_input=imgs,
                         metadata_input=jnp.asarray(meta), train=False)
    scores = np.asarray(jax.nn.sigmoid(logits)).reshape(-1)
    expected = cand["expected_scores"].to_numpy()
    assert np.max(np.abs(scores - expected)) < 1e-5


def test_golden_scores_parity_through_scorer():
    from btsbot_tpu.engine.serve import AlertScorer

    config, model, variables, trips, cand = _load_example()
    meta = cand[config["metadata_cols"]].to_numpy().astype(np.float32)
    scorer = AlertScorer(config, variables, batch_size=8, dtype=jnp.float32)
    scores = scorer(trips.astype(np.float32), meta)
    expected = cand["expected_scores"].to_numpy()
    assert np.max(np.abs(scores - expected)) < 1e-5
