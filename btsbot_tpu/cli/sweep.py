"""Hyperparameter sweep CLI: ``python -m btsbot_tpu.cli.sweep <sweep.json>``.

The reference runs sweeps through wandb.agent (train.py:46-54,569-575),
which requires the wandb service.  This driver runs grid or random sweeps
natively — each trial is a full ``run_training`` with overridden config
keys — and logs through the optional experiment logger (wandb when
installed, JSONL otherwise).

Sweep config format (flat JSON):

    {
      "base_config": "btsbot_tpu/train_configs/prod_config.json",
      "method": "random",              // or "grid"
      "count": 5,                      // random trials (grid ignores)
      "seed": 0,
      "parameters": {
        "learning_rate": {"values": [1e-4, 3e-4, 1e-3]},
        "conv1_channels": {"values": [16, 32, 64]},
        "meta_dropout": {"min": 0.1, "max": 0.5}   // uniform (random only)
      }
    }
"""

from __future__ import annotations

import argparse
import itertools
import json

import numpy as np

from ..core.config import load_config, normalize_config
from ..engine.train import run_training


def sample_trials(sweep: dict) -> list[dict]:
    params = sweep.get("parameters", {})
    method = sweep.get("method", "grid")
    if method == "grid":
        keys = list(params)
        value_lists = []
        for k in keys:
            if "values" not in params[k]:
                raise ValueError(
                    f"grid sweeps need explicit 'values' for {k}")
            value_lists.append(params[k]["values"])
        return [dict(zip(keys, combo))
                for combo in itertools.product(*value_lists)]
    if method == "random":
        rng = np.random.default_rng(sweep.get("seed", 0))
        trials = []
        for _ in range(int(sweep.get("count", 5))):
            t = {}
            for k, spec in params.items():
                if "values" in spec:
                    t[k] = spec["values"][rng.integers(len(spec["values"]))]
                else:
                    t[k] = float(rng.uniform(spec["min"], spec["max"]))
            trials.append(t)
        return trials
    raise ValueError(f"Unknown sweep method: {method}")


def run_sweep(sweep: dict, data_dir: str = "data", out_root: str = "models",
              logger_kind: str = "jsonl", **run_kwargs) -> list[dict]:
    from ..utils.logging import make_logger

    base = load_config(sweep["base_config"])
    results = []
    for i, overrides in enumerate(sample_trials(sweep)):
        config = normalize_config({**base, **overrides})
        run_name = f"sweep{i:03d}"
        if logger_kind == "jsonl":
            logger = make_logger("jsonl",
                                 path=f"{out_root}/{run_name}_log.jsonl")
        else:
            logger = make_logger(logger_kind, config=dict(config),
                                 run_name=run_name)
        print(f"=== trial {i}: {overrides}")
        result = run_training(config, data_dir=data_dir, out_root=out_root,
                              run_name=run_name, logger=logger, **run_kwargs)
        best_val = float(np.min(result["history"]["val_loss"]))
        results.append({"trial": i, "overrides": overrides,
                        "best_val_loss": best_val,
                        "model_dir": result["model_dir"]})
        logger.finish()
    results.sort(key=lambda r: r["best_val_loss"])
    print("=== sweep results (best first)")
    for r in results:
        print(f"  {r['best_val_loss']:.5f}  {r['overrides']}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="Run a hyperparameter sweep")
    p.add_argument("sweep_config")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--out-root", default="models")
    p.add_argument("--logger", default="jsonl",
                   choices=["jsonl", "wandb", "null"])
    args = p.parse_args(argv)
    with open(args.sweep_config) as f:
        sweep = json.load(f)
    run_sweep(sweep, data_dir=args.data_dir, out_root=args.out_root,
              logger_kind=args.logger, make_figure=False)


if __name__ == "__main__":
    main()
