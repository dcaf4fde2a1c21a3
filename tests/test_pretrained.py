"""Pretrained-backbone initialization (the reference's timm recipe,
architectures.py:31,62,108,132): backbone-only timm/zoobot state dicts seed
the model's backbone subtree, classifier discarded, with strict accounting
and manifest validation, wired through run_training's backbone_checkpoint
config key."""

import numpy as np
import pytest

import jax

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.dataset import AlertDataset
from btsbot_tpu.engine.train import run_training
from btsbot_tpu.interop.convert import (
    UnconsumedKeysError,
    _convnext_backbone_params,
)
from btsbot_tpu.interop.manifests import expected_checkpoint_manifest
from btsbot_tpu.interop.pretrained import (
    backbone_variables,
    init_from_backbone_checkpoint,
    maybe_init_pretrained,
)

META_COLS = [f"m{i}" for i in range(25)]

ATTO = "convnext_atto.d2_in1k"

MM_CONVNEXT_CFG = normalize_config({
    "model_name": "mm_ConvNeXt",
    "model_kind": ATTO,
    "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
})


def _timm_checkpoint(model_kind=ATTO, num_classes=1000, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=shape).astype(np.float32)
            for k, shape in
            expected_checkpoint_manifest(model_kind, num_classes).items()}


def _assert_tree_equal(got, want, path=""):
    assert set(got) == set(want), f"{path}: {set(got) ^ set(want)}"
    for k in want:
        if isinstance(want[k], dict):
            _assert_tree_equal(got[k], want[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]),
                                          err_msg=f"{path}/{k}")


def test_backbone_seeds_mm_convnext():
    sd = _timm_checkpoint()
    _, variables = init_model(MM_CONVNEXT_CFG, rng=0)
    before = variables["params"]["backbone"]
    seeded = init_from_backbone_checkpoint(MM_CONVNEXT_CFG, variables, sd)

    # the backbone tree equals the source checkpoint's conversion exactly
    want = _convnext_backbone_params(dict(sd), "", ATTO)
    _assert_tree_equal(seeded["params"]["backbone"], want)
    # and differs from the random init it replaced
    stem = np.asarray(before["stem_conv"]["kernel"])
    assert not np.array_equal(
        stem, np.asarray(seeded["params"]["backbone"]["stem_conv"]["kernel"]))
    # heads stay at their fresh init (classifier discarded; non-LS
    # mm_ConvNeXt does not keep the backbone head norm)
    assert "head_norm" not in seeded["params"]
    _assert_tree_equal(seeded["params"]["combined_head"],
                       variables["params"]["combined_head"])


def test_image_only_convnext_keeps_pretrained_head_norm():
    cfg = normalize_config({
        "model_name": "ConvNeXt", "model_kind": ATTO,
        "train_data_version": "v12", "metadata_cols": META_COLS,
        "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.1,
    })
    sd = _timm_checkpoint(seed=1)
    _, variables = init_model(cfg, rng=0)
    seeded = init_from_backbone_checkpoint(cfg, variables, sd)
    np.testing.assert_array_equal(
        np.asarray(seeded["params"]["head_norm"]["scale"]), sd["head.norm.weight"])


def test_zoobot_style_backbone_only_checkpoint():
    """galaxyzoo zoobot encoders ship without any classifier head and may
    carry a wrapper prefix."""
    sd = {k: v for k, v in _timm_checkpoint(seed=2).items()
          if not k.startswith("head.")}
    wrapped = {f"encoder.{k}": v for k, v in sd.items()}
    fragment = backbone_variables(MM_CONVNEXT_CFG, wrapped)
    want = _convnext_backbone_params(dict(sd), "", ATTO)
    _assert_tree_equal(fragment["params"]["backbone"], want)


def test_drifted_checkpoint_refuses_to_half_load():
    sd = _timm_checkpoint(seed=3)
    sd["stages.0.blocks.0.novel_rw_extra.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="novel_rw_extra"):
        backbone_variables(MM_CONVNEXT_CFG, sd)
    # validate=False skips the manifest report but strict conversion
    # accounting still refuses the unconsumed key
    with pytest.raises(UnconsumedKeysError, match="novel_rw_extra"):
        backbone_variables(MM_CONVNEXT_CFG, sd, validate=False)
    sd2 = _timm_checkpoint(seed=3)
    del sd2["stem.0.weight"]
    with pytest.raises(ValueError, match="stem.0.weight"):
        backbone_variables(MM_CONVNEXT_CFG, sd2)


def test_no_backbone_models_reject_checkpoints():
    cfg = normalize_config({
        "model_name": "um_nn", "train_data_version": "v12",
        "metadata_cols": META_COLS, "meta_fc1_neurons": 8,
        "meta_fc2_neurons": 8, "meta_dropout": 0.1,
    })
    with pytest.raises(ValueError, match="no pretrained-capable backbone"):
        backbone_variables(cfg, _timm_checkpoint())


def test_maxvit_backbone_seed_includes_batch_stats(monkeypatch):
    from btsbot_tpu.models import maxvit as maxvit_mod
    tiny = {"depths": (1, 1), "dims": (32, 64), "stem_width": 32}
    monkeypatch.setitem(maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny", tiny)
    cfg = normalize_config({
        "model_name": "mm_MaxViT", "model_kind": "maxvit_tiny_rw_64.test",
        "train_data_version": "v12", "metadata_cols": META_COLS,
        "meta_fc1_neurons": 8, "meta_fc2_neurons": 8, "meta_dropout": 0.1,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
    })
    # build the checkpoint to the monkeypatched spec (window 64/32 = 2)
    man = {}
    from btsbot_tpu.interop import manifests as M
    monkeypatch.setattr(M, "load_manifest",
                        lambda mk: M.expected_checkpoint_manifest(mk, None))
    real_gen = M._maxvit_manifest

    def tiny_gen(model_kind, num_classes):
        out = real_gen(model_kind, num_classes)
        # regenerate rel-pos tables for window 2 instead of 7
        return {k: ((3 ** 2, v[1]) if k.endswith("relative_position_bias_table")
                    else v) for k, v in out.items()}

    monkeypatch.setattr(M, "_maxvit_manifest", tiny_gen)
    man = M.expected_checkpoint_manifest("maxvit_tiny_rw_64.test", None)
    rng = np.random.default_rng(4)
    sd = {k: rng.normal(size=shape).astype(np.float32)
          for k, shape in man.items()}

    _, variables = init_model(cfg, rng=0)
    seeded = init_from_backbone_checkpoint(cfg, variables, sd)
    np.testing.assert_array_equal(
        np.asarray(seeded["batch_stats"]["backbone"]["stem_norm1"]["mean"]),
        sd["stem.norm1.running_mean"])


def test_npz_checkpoint_roundtrip(tmp_path):
    sd = _timm_checkpoint(seed=5)
    path = tmp_path / "backbone.npz"
    np.savez(path, **sd)
    _, variables = init_model(MM_CONVNEXT_CFG, rng=0)
    seeded = init_from_backbone_checkpoint(MM_CONVNEXT_CFG, variables,
                                           str(path))
    want = _convnext_backbone_params(dict(sd), "", ATTO)
    _assert_tree_equal(seeded["params"]["backbone"], want)


def test_run_training_starts_from_backbone_checkpoint(tmp_path):
    """End-to-end: the backbone_checkpoint config key seeds training.  With
    learning_rate=0 the params after one epoch are exactly the init, which
    proves run_training started from the provided backbone weights."""
    sd = _timm_checkpoint(seed=6)
    path = tmp_path / "backbone.npz"
    np.savez(path, **sd)

    cfg = dict(MM_CONVNEXT_CFG)
    cfg.update({
        "backbone_checkpoint": str(path),
        "learning_rate": 0.0, "beta_1": 0.9, "beta_2": 0.999,
        "batch_size": 16, "epochs": 1, "warmup_epochs": 0, "patience": 2,
        "random_seed": 1,
    })
    rng = np.random.default_rng(7)
    n = 32
    ds = AlertDataset(
        labels=(rng.random(n) < 0.5).astype(np.float32),
        images=rng.normal(0, 0.1, (n, 63, 63, 3)).astype(np.float32),
        metadata=rng.normal(0, 1, (n, 25)).astype(np.float32))

    result = run_training(
        normalize_config(cfg), run_name="pre", out_root=str(tmp_path),
        train_ds=ds, val_ds=ds, make_figure=False, log=lambda *_: None)
    want = _convnext_backbone_params(dict(sd), "", ATTO)
    _assert_tree_equal(
        jax.tree.map(np.asarray, result["state"].params["backbone"]), want)
