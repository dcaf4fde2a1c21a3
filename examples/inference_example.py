#!/usr/bin/env python3
"""Off-the-shelf inference example (reference inference_example.py).

Downloads a published BTSbot checkpoint from the HuggingFace Hub (or uses a
local snapshot / the shipped synthetic example model), scores the example
alerts in one batch, and prints predictions vs labels.

    python examples/inference_example.py --architecture convnext \
        --pretrain galaxyzoo --multi_modal
    python examples/inference_example.py --local   # shipped example model
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "btsbot_tpu", "example_data")


def parse_args():
    p = argparse.ArgumentParser(
        description="Score example alerts with a published BTSbot model")
    p.add_argument("--architecture", choices=["convnext", "maxvit"],
                   default="convnext")
    p.add_argument("--pretrain", default="galaxyzoo",
                   choices=["imagenet", "galaxyzoo", "randinit"])
    p.add_argument("--multi_modal", action="store_true")
    p.add_argument("--local", action="store_true",
                   help="Use the shipped synthetic example model instead of "
                        "downloading from the Hub")
    p.add_argument("--example-dir", default=EXAMPLE_DIR,
                   help="Directory with usage_triplets.npy + "
                        "usage_candidates.csv")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend (no TPU needed)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import pandas as pd

    import btsbot_tpu
    from btsbot_tpu.engine.serve import AlertScorer

    if args.local:
        import flax.serialization
        with open(os.path.join(EXAMPLE_DIR, "train_config.json")) as f:
            config = btsbot_tpu.normalize_config(json.load(f))
        _, template = btsbot_tpu.init_model(config, rng=0)
        with open(os.path.join(EXAMPLE_DIR, "params.msgpack"), "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())
    else:
        _, variables, config = btsbot_tpu.load_HF_model(
            args.architecture, args.multi_modal, args.pretrain)

    cand = pd.read_csv(os.path.join(args.example_dir,
                                    "usage_candidates.csv"))
    trips = np.load(os.path.join(args.example_dir,
                                 "usage_triplets.npy")).astype(np.float32)
    meta = None
    if config.need_metadata:
        meta = cand[config["metadata_cols"]].to_numpy().astype(np.float32)

    scorer = AlertScorer(config, variables, batch_size=64,
                         dtype=jnp.float32)
    scores = scorer(trips if config.need_triplets else None, meta)
    preds = np.rint(scores).astype(int)

    print("scores:", np.round(scores, 4))
    print("preds: ", preds)
    print("labels:", cand["label"].to_numpy())


if __name__ == "__main__":
    main()
