"""Offline proof of the real-checkpoint closure harness
(scripts/validate_real_checkpoints.py, VERDICT r3 next-step #4).

The real artifacts need egress; these tests drive the SAME code paths the
online run will take — manifest drift check, backbone conversion, torch
feature-parity oracle, snapshot-dir load, golden-score comparison — against
fakes, so the only thing the network run adds is the artifacts themselves.
"""

import json
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

import validate_real_checkpoints as vrc  # noqa: E402

META_COLS = [f"m{i}" for i in range(25)]


def _manifest_random_sd(model_kind, seed=0):
    """State dict exactly matching the vendored backbone manifest."""
    from btsbot_tpu.interop.manifests import load_manifest

    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in load_manifest(model_kind).items():
        if key.startswith("head."):
            continue  # corpus-specific classifier; harness exempts it
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0, np.int64)
        elif "running_var" in key:
            sd[key] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def test_timm_leg_manifest_and_conversion_convnext():
    res = vrc.validate_timm_backbone(
        "convnext_pico.d1_in1k",
        state_dict=_manifest_random_sd("convnext_pico.d1_in1k"),
        torch_oracle=None, log=lambda *_: None)
    assert res["manifest_report"]["ok"]
    assert res["forward_finite"]
    assert res["torch_feature_parity"] is None
    assert res["ok"]


@pytest.mark.slow
def test_timm_leg_manifest_and_conversion_maxvit():
    res = vrc.validate_timm_backbone(
        "maxvit_tiny_rw_224.sw_in1k",
        state_dict=_manifest_random_sd("maxvit_tiny_rw_224.sw_in1k"),
        torch_oracle=None, log=lambda *_: None)
    assert res["manifest_report"]["ok"]
    assert res["forward_finite"]
    assert res["ok"]


def test_timm_leg_flags_drift():
    sd = _manifest_random_sd("convnext_pico.d1_in1k")
    key = next(k for k in sd if k.endswith(".weight"))
    sd[key] = sd[key][..., :-1]  # shape drift
    del sd[next(k for k in sd if "stages.3" in k)]  # missing key
    res = vrc.validate_timm_backbone(
        "convnext_pico.d1_in1k", state_dict=sd, torch_oracle=None,
        log=lambda *_: None)
    assert not res["ok"]
    assert not res["manifest_report"]["ok"]
    assert res["manifest_report"]["missing"]
    assert res["manifest_report"]["mismatched"]


def test_timm_leg_torch_feature_parity_oracle():
    """The full oracle path: a timm-shaped torch ConvNeXt (the test mirror at
    the real pico spec) provides both the state dict and forward_features;
    the converted flax backbone must match its feature map."""
    import torch

    from torch_mirrors import TimmStyleConvNeXt

    torch.manual_seed(3)
    mirror = TimmStyleConvNeXt(depths=(2, 2, 6, 2),
                               dims=(64, 128, 256, 512))

    class Oracle:
        def eval(self):
            mirror.eval()
            return self

        def forward_features(self, x):
            return mirror(x)

    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    res = vrc.validate_timm_backbone(
        "convnext_pico.d1_in1k", state_dict=sd, torch_oracle=Oracle(),
        log=lambda *_: None)
    assert res["manifest_report"]["ok"]
    assert res["torch_feature_parity"] is True, \
        f"max diff {res['torch_feature_maxdiff']}"
    assert res["ok"]


def _fake_fixture(model, variables, config, n=7, seed=1):
    """Random fixture whose expected_scores the fake snapshot reproduces."""
    import pandas as pd

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    trips = rng.normal(size=(n, 63, 63, 3)).astype(np.float32)
    cand = pd.DataFrame({c: rng.normal(size=n).astype(np.float32)
                         for c in META_COLS})
    meta = jnp.asarray(cand[config["metadata_cols"]].to_numpy(np.float32))
    scores = np.asarray(jax.nn.sigmoid(model.apply(
        variables, image_input=jnp.asarray(trips), metadata_input=meta,
        train=False)).reshape(-1))
    cand["expected_scores"] = scores
    return trips, cand


@pytest.fixture
def fake_snapshot(tmp_path):
    """A nabeelr/BTSbot-style snapshot dir + matching golden fixture."""
    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.interop.export import save_torch_checkpoint
    from btsbot_tpu.interop.hf import get_local_model_dir

    config = normalize_config({
        "model_name": "mm_cnn", "train_data_version": "v10",
        "metadata_cols": META_COLS,
        "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 5,
        "conv_dropout1": 0.1, "conv_dropout2": 0.1,
        "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
        "comb_fc1_neurons": 16, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
    })
    model, variables = init_model(config, rng=0)

    models_root = str(tmp_path / "models")
    model_dir = get_local_model_dir("convnext", True, "imagenet",
                                    models_root)
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, "train_config.json"), "w") as f:
        json.dump(dict(config), f)
    save_torch_checkpoint(os.path.join(model_dir, "pytorch_model.bin"),
                          config, variables)
    fixture = _fake_fixture(model, variables, config)
    return models_root, fixture


def test_btsbot_leg_matches_golden(fake_snapshot):
    models_root, fixture = fake_snapshot
    res = vrc.validate_btsbot_repo("convnext", True, "imagenet",
                                   models_root=models_root, fixture=fixture,
                                   log=lambda *_: None)
    assert res["scores_finite"]
    assert res["matches_expected"] is True
    assert res["expected_maxdiff"] < 1e-5
    assert res["ok"]


def test_btsbot_leg_detects_mismatch(fake_snapshot):
    models_root, (trips, cand) = fake_snapshot
    cand = cand.copy()
    cand["expected_scores"] = 1.0 - cand["expected_scores"]
    res = vrc.validate_btsbot_repo("convnext", True, "imagenet",
                                   models_root=models_root,
                                   fixture=(trips, cand),
                                   log=lambda *_: None)
    assert res["matches_expected"] is False


def test_run_all_offline(fake_snapshot, tmp_path):
    models_root, fixture = fake_snapshot
    out = str(tmp_path / "docs")
    res = vrc.run_all(
        timm_kinds=("convnext_pico.d1_in1k",),
        btsbot_repos=[("convnext", True, "imagenet")],
        models_root=models_root, out=out,
        state_dict_fetcher=_manifest_random_sd, torch_oracle=None,
        fixture=fixture, log=lambda *_: None)
    assert res["closure"] == {"timm_ok": True, "btsbot_ok": True,
                              "expected_scores_closed": True}
    with open(os.path.join(out, "real_checkpoint_validation.json")) as f:
        on_disk = json.load(f)
    assert on_disk["expected_scores_matched_by"] == \
        ["nabeelr/BTSbot-convnext-pico-in1k-metadata"]


def test_closure_not_applicable_without_provenance_repo(fake_snapshot,
                                                        tmp_path):
    """A single-repo run of a non-provenance model that does NOT reproduce
    expected_scores is still a successful validation: only
    EXPECTED_SCORES_REPO is expected to match the golden column."""
    models_root, (trips, cand) = fake_snapshot
    cand = cand.copy()
    cand["expected_scores"] = 1.0 - cand["expected_scores"]
    res = vrc.run_all(
        timm_kinds=(), btsbot_repos=[("convnext", True, "imagenet")],
        models_root=models_root, out=str(tmp_path / "docs"),
        fixture=(trips, cand), log=lambda *_: None)
    assert res["closure"]["btsbot_ok"] is True
    assert res["closure"]["expected_scores_closed"] is None
    assert all(v for v in res["closure"].values() if v is not None)


def test_closure_fails_when_provenance_repo_mismatches(fake_snapshot,
                                                       tmp_path):
    models_root, (trips, cand) = fake_snapshot
    cand = cand.copy()
    cand["expected_scores"] = 1.0 - cand["expected_scores"]
    # the provenance repo is in the set but absent from the fake snapshot
    # dir (fetch fails) -> no match anywhere -> closure must be False
    res = vrc.run_all(
        timm_kinds=(),
        btsbot_repos=[vrc.EXPECTED_SCORES_REPO,
                      ("convnext", True, "imagenet")],
        models_root=models_root, out=str(tmp_path / "docs"),
        fixture=(trips, cand), log=lambda *_: None)
    assert res["closure"]["expected_scores_closed"] is False
