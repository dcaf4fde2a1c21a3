"""Embeddings extraction + sweep driver + val-cut flags."""

import json

import numpy as np
import pandas as pd

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.cli.sweep import sample_trials
from btsbot_tpu.data.dataset import AlertDataset, apply_val_cuts
from btsbot_tpu.metrics.embeddings import (
    extract_features,
    generate_embeddings,
    project_2d,
)
from test_engine import SMALL_CFG, synthetic_dataset


def test_extract_features_shapes_and_separation():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    ds = synthetic_dataset(64, seed=0)
    feats = extract_features(model, config, variables["params"],
                             variables.get("batch_stats", {}), ds,
                             batch_size=32)
    # mm_cnn penultimate = combined head fc2 output
    assert feats.shape == (64, SMALL_CFG["comb_fc2_neurons"])
    assert np.all(np.isfinite(feats))

    emb = generate_embeddings(model, config, variables["params"],
                              variables.get("batch_stats", {}), ds,
                              candids=np.arange(64) + 1000)
    assert emb.shape == (64, 3)
    assert emb[0, 2] == 1000


def test_extract_features_metadata_only():
    config = normalize_config({**SMALL_CFG, "model_name": "um_nn"})
    model, variables = init_model(config, rng=0)
    ds = synthetic_dataset(40, seed=1)
    ds = AlertDataset(labels=ds.labels, metadata=ds.metadata)
    feats = extract_features(model, config, variables["params"],
                             variables.get("batch_stats", {}), ds,
                             batch_size=16)
    assert feats.shape == (40, SMALL_CFG["meta_fc2_neurons"])


def test_project_2d_pca_fallback():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(50, 8))
    emb = project_2d(feats, method="auto")
    assert emb.shape == (50, 2)


def test_sweep_trial_sampling():
    grid = sample_trials({
        "method": "grid",
        "parameters": {"a": {"values": [1, 2]}, "b": {"values": [10, 20]}},
    })
    assert len(grid) == 4
    assert {frozenset(t.items()) for t in grid} == {
        frozenset({("a", 1), ("b", 10)}), frozenset({("a", 1), ("b", 20)}),
        frozenset({("a", 2), ("b", 10)}), frozenset({("a", 2), ("b", 20)})}

    rnd = sample_trials({
        "method": "random", "count": 7, "seed": 3,
        "parameters": {"lr": {"min": 1e-4, "max": 1e-3},
                       "c": {"values": [4, 8]}},
    })
    assert len(rnd) == 7
    assert all(1e-4 <= t["lr"] <= 1e-3 and t["c"] in (4, 8) for t in rnd)
    # deterministic per seed
    assert rnd == sample_trials({
        "method": "random", "count": 7, "seed": 3,
        "parameters": {"lr": {"min": 1e-4, "max": 1e-3},
                       "c": {"values": [4, 8]}}})


def test_apply_val_cuts():
    ds = synthetic_dataset(20, seed=2)
    cand = pd.DataFrame({
        "is_SN": [True] * 10 + [False] * 10,
        "near_threshold": [True, False] * 10,
        "is_rise": [True] * 20,
    })
    ds = AlertDataset(labels=ds.labels, images=ds.images,
                      metadata=ds.metadata, candidates=cand)

    out = apply_val_cuts(ds, normalize_config(
        {**SMALL_CFG, "val_sne_only": 1}))
    assert len(out) == 10 and out.candidates["is_SN"].all()

    out2 = apply_val_cuts(ds, normalize_config(
        {**SMALL_CFG, "val_keep_near_threshold": 0}))
    assert len(out2) == 10 and not out2.candidates["near_threshold"].any()

    out3 = apply_val_cuts(ds, normalize_config(SMALL_CFG))
    assert len(out3) == 20  # no flags -> untouched


class _FakeWandbRun:
    def __init__(self, name, config):
        self.name = name
        self.config = config
        self.summary = {}
        self.logged = []
        self.closed = False

    def log(self, metrics, step=None):
        self.logged.append((step, dict(metrics)))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.closed = True
        return False


class _FakeWandbAPI:
    """The wandb surface run_wandb_agent touches: agent() pulls trial
    configs from the 'sweep server' and calls the function per trial."""

    def __init__(self, trial_configs):
        self.trial_configs = list(trial_configs)
        self.runs = []
        self.agent_calls = []

    def init(self, **kw):
        run = _FakeWandbRun(f"fake-run-{len(self.runs)}",
                            self.trial_configs[len(self.runs)])
        self.runs.append(run)
        return run

    def agent(self, sweep_id, function, count, project):
        self.agent_calls.append((sweep_id, count, project))
        for _ in range(count):
            function()


def test_wandb_sweep_agent_adapter(tmp_path):
    """Reference sweep workflow (train.py:46-54,569-575) drop-in: the sweep
    server (fake) supplies per-trial configs; each trial trains fully and
    logs epochs + summary through the LIVE run without opening/closing it."""
    from btsbot_tpu.cli.sweep import run_wandb_agent

    base = {**SMALL_CFG, "epochs": 2}
    api = _FakeWandbAPI([
        {**base, "learning_rate": 1e-3},
        {**base, "learning_rate": 3e-3},
    ])
    results = run_wandb_agent(
        "4egcxmet", project="BTSbotv2", count=2, out_root=str(tmp_path),
        wandb_api=api, make_figure=False,
        train_ds=synthetic_dataset(96, seed=0),
        val_ds=synthetic_dataset(48, seed=1))

    assert api.agent_calls == [("4egcxmet", 2, "BTSbotv2")]
    assert [r["run_name"] for r in results] == ["fake-run-0", "fake-run-1"]
    assert all(np.isfinite(r["best_val_loss"]) for r in results)
    for run in api.runs:
        assert run.closed            # agent context closed the run
        assert len(run.logged) >= 2  # per-epoch metrics went to the run
        assert any("val_loss" in m for _, m in run.logged)
        assert run.summary           # diagnostics summary landed


def test_sweep_cli_rejects_json_with_wandb_id(tmp_path):
    """A local sweep JSON and --wandb-sweep-id are mutually exclusive —
    silently dropping either half of the command line hid user error."""
    import pytest

    from btsbot_tpu.cli.sweep import main

    cfg = tmp_path / "sweep.json"
    cfg.write_text("{}")
    with pytest.raises(SystemExit) as e:
        main([str(cfg), "--wandb-sweep-id", "abc123"])
    assert e.value.code == 2  # argparse usage error
