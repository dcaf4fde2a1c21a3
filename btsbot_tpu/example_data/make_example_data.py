"""Generate the shipped example/golden dataset.

The reference ships 39 real alerts with an ``expected_scores`` golden column
(`/root/reference/btsbot/example_data/usage_candidates.csv`) as its de-facto
regression fixture (SURVEY.md §4).  This repo ships a synthetic equivalent:
16 procedurally generated alerts (seeded), a saved mm_cnn parameter set, and
golden scores computed at generation time — so score-parity regressions are
caught without redistributing survey data.

Run from the repo root:  python -m btsbot_tpu.example_data.make_example_data
"""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

META_COLS = [
    "sgscore1", "distpsnr1", "sgscore2", "distpsnr2", "fwhm", "magpsf",
    "sigmapsf", "chipsf", "ra", "dec", "diffmaglim", "ndethist", "nmtchps",
    "age", "days_since_peak", "days_to_peak", "peakmag_so_far", "new_drb",
    "ncovhist", "nnotdet", "chinr", "sharpnr", "scorr", "sky", "maxmag_so_far",
]

EXAMPLE_CONFIG = {
    "model_name": "mm_cnn",
    "train_data_version": "vexample",
    "metadata_cols": META_COLS,
    "conv1_channels": 32,
    "conv2_channels": 64,
    "conv_kernel": 5,
    "conv_dropout1": 0.5,
    "conv_dropout2": 0.55,
    "meta_fc1_neurons": 128,
    "meta_fc2_neurons": 128,
    "meta_dropout": 0.25,
    "comb_fc1_neurons": 8,
    "comb_fc2_neurons": 8,
    "comb_dropout": 0.2,
    "batch_size": 16,
    "epochs": 1,
    "patience": 1,
    "learning_rate": 1e-4,
    "beta_1": 0.99,
    "beta_2": 0.99,
    "random_seed": 0,
}

N_ALERTS = 16


def synthesize_alerts(seed: int = 0):
    """Seeded synthetic alerts: L2-normalized 63×63×3 triplets with a faint
    PSF-like blob, plus plausible metadata rows."""
    rng = np.random.default_rng(seed)
    trips = rng.normal(0, 1.0, (N_ALERTS, 63, 63, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:63, 0:63]
    labels = (rng.random(N_ALERTS) < 0.5).astype(int)
    for i in range(N_ALERTS):
        cx, cy = rng.uniform(25, 38, 2)
        amp = 8.0 if labels[i] else 2.0
        blob = amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * rng.uniform(1.5, 3.0) ** 2)))
        trips[i, :, :, 0] += blob
        trips[i, :, :, 2] += blob * 0.8
    norms = np.linalg.norm(trips, axis=(1, 2), keepdims=True)
    trips = (trips / norms).astype(np.float32)

    meta = rng.normal(0, 1, (N_ALERTS, len(META_COLS))).astype(np.float32)
    meta[:, META_COLS.index("magpsf")] = rng.uniform(16.5, 20.5, N_ALERTS)
    meta[labels == 1, META_COLS.index("magpsf")] -= 1.0
    return trips, meta, labels


def main() -> None:
    import flax.serialization
    import jax.numpy as jnp

    from ..core.config import normalize_config
    from ..models.factory import init_model

    config = normalize_config(EXAMPLE_CONFIG)
    trips, meta, labels = synthesize_alerts()

    model, variables = init_model(config, rng=0)
    import jax
    logits = model.apply(variables, image_input=jnp.asarray(trips),
                         metadata_input=jnp.asarray(meta), train=False)
    scores = np.asarray(jax.nn.sigmoid(logits)).reshape(-1)

    np.save(os.path.join(HERE, "usage_triplets.npy"),
            trips.astype(np.float64))
    import pandas as pd
    df = pd.DataFrame(meta, columns=META_COLS)
    df.insert(0, "objectId", [f"SYN{i:05d}" for i in range(N_ALERTS)])
    df.insert(1, "jd", 2459300.0 + np.arange(N_ALERTS))
    df["label"] = labels
    df["expected_scores"] = scores
    df.to_csv(os.path.join(HERE, "usage_candidates.csv"), index=False)

    with open(os.path.join(HERE, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    with open(os.path.join(HERE, "train_config.json"), "w") as f:
        json.dump(dict(config), f, indent=2)
    print(f"Wrote example data to {HERE}; scores[:4] = {scores[:4]}")


if __name__ == "__main__":
    main()
