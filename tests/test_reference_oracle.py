"""Parity oracled by the reference's OWN executable code (VERDICT r2 #1).

Every other parity test in this suite asserts against builder-written torch
mirrors (tests/torch_mirrors*.py) — a common-mode error in the builder's
understanding of the reference would pass those tests.  Here the ground
truth is the reference source itself, imported and executed:

* ``/root/reference/btsbot/architectures.py`` — the real ``mm_cnn`` /
  ``um_cnn`` / ``um_nn`` / ``frozen_fusion`` classes (lines 174-372) run
  forward as oracles; for the timm-backed families the reference's *head
  surgery and fusion glue* (lines 25-171) executes on a stub
  ``timm.create_model`` that returns the mirror backbone, so everything the
  reference wrote (Sequential composition, activation placement,
  ``head.in_features`` plumbing, ``load_BTSbot_model``'s checkpoint path)
  is reference-executed; only the timm *backbone internals* remain
  mirror-defined (they are not reference code — the reference downloads
  them).
* ``/root/reference/btsbot/query_data/train_val_test_split.py`` — the split
  engine runs on synthetic base data in a tmp dir; outputs are compared
  bit-for-bit with ``data/splits.build_dataset_files``.
* ``/root/reference/btsbot/val.py`` — ``diagnostic_fig`` (the policy replay
  + diagnostics, lines 173-683) runs as the oracle for
  ``metrics/{policy,classification}``.

The reference's only blocking imports are ``timm`` (architectures.py:5) and
``torchvision`` (utils.py:7) — both absent here and stubbed in sys.modules;
neither stub is used by the code paths under test except where a test
explicitly installs a ``create_model`` factory.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/btsbot"
REF_DATA = os.path.join(REF_DIR, "example_data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present")

META_COLS = [f"m{i}" for i in range(25)]

_STUBBED = ("timm", "torchvision", "torchvision.transforms",
            "torchvision.transforms.v2", "utils", "architectures", "val")


@pytest.fixture(scope="module")
def ref():
    """Import the reference's architectures.py and val.py with absent
    third-party deps stubbed.  Restores sys.modules/sys.path after."""
    from importlib.machinery import ModuleSpec

    def _stub(name, is_pkg=False):
        m = types.ModuleType(name)
        m.__spec__ = ModuleSpec(name, loader=None, is_package=is_pkg)
        if is_pkg:
            m.__path__ = []
        return m

    saved = {n: sys.modules.pop(n, None) for n in _STUBBED}
    timm = _stub("timm")
    timm.create_model = None  # installed per-test via _with_create_model
    tv = _stub("torchvision", is_pkg=True)
    tvt = _stub("torchvision.transforms", is_pkg=True)
    tvv2 = _stub("torchvision.transforms.v2")
    tv.transforms = tvt
    tvt.v2 = tvv2
    sys.modules.update({
        "timm": timm, "torchvision": tv,
        "torchvision.transforms": tvt, "torchvision.transforms.v2": tvv2,
    })
    sys.path.insert(0, REF_DIR)
    prev_dwb = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
    try:
        architectures = importlib.import_module("architectures")
        val = importlib.import_module("val")
        yield types.SimpleNamespace(
            architectures=architectures, val=val, timm=timm)
    finally:
        sys.path.remove(REF_DIR)
        sys.dont_write_bytecode = prev_dwb
        for n in _STUBBED:
            sys.modules.pop(n, None)
            if saved[n] is not None:
                sys.modules[n] = saved[n]


@pytest.fixture(scope="module")
def real_alerts():
    """The reference's real 39-alert example fixture (real ZTF cutout and
    metadata statistics)."""
    import pandas as pd

    triplets = np.load(os.path.join(REF_DATA, "usage_triplets.npy"))
    cand = pd.read_csv(os.path.join(REF_DATA, "usage_candidates.csv"))
    meta = np.stack([np.asarray(cand[c], np.float32)
                     for c in _REAL_META_COLS], axis=1)
    return triplets.astype(np.float32), meta


_REAL_META_COLS = [
    "sgscore1", "distpsnr1", "sgscore2", "distpsnr2", "fwhm", "magpsf",
    "sigmapsf", "chipsf", "ra", "dec", "diffmaglim", "ndethist", "nmtchps",
    "age", "days_since_peak", "days_to_peak", "peakmag_so_far", "new_drb",
    "ncovhist", "nnotdet", "chinr", "sharpnr", "scorr", "sky",
    "maxmag_so_far",
]


def _compare_with_flax(config, oracle, img=None, meta=None, rtol=1e-4,
                       atol=1e-5):
    """state_dict(reference model) → our converter → flax; assert sigmoid
    score parity."""
    import torch

    import jax
    import jax.numpy as jnp

    from btsbot_tpu import build_model, torch_state_dict_to_variables

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)

    with torch.no_grad():
        args = []
        if img is not None:
            args.append(torch.from_numpy(
                np.transpose(img, (0, 3, 1, 2)).copy()))
        if meta is not None:
            args.append(torch.from_numpy(meta))
        expected = torch.sigmoid(oracle(*args).reshape(-1)).numpy()

    got = np.asarray(jax.nn.sigmoid(model.apply(
        variables,
        image_input=None if img is None else jnp.asarray(img),
        metadata_input=None if meta is None else jnp.asarray(meta),
        train=False).reshape(-1)))
    np.testing.assert_allclose(got, expected, rtol=rtol, atol=atol)
    return sd


# ------------------------- plain torch families ---------------------------
# These classes have no timm dependency: the reference model itself is the
# oracle, end to end.

MM_CNN_CFG = {
    "model_name": "mm_cnn", "train_data_version": "v10",
    "metadata_cols": _REAL_META_COLS,
    "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
    "conv_dropout1": 0.5, "conv_dropout2": 0.55,
    "meta_fc1_neurons": 128, "meta_fc2_neurons": 128, "meta_dropout": 0.3,
    "comb_fc1_neurons": 256, "comb_fc2_neurons": 32, "comb_dropout": 0.4,
}


def test_reference_mm_cnn_oracle(ref, real_alerts):
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, meta = real_alerts
    config = normalize_config(MM_CNN_CFG)
    torch.manual_seed(51)
    oracle = ref.architectures.mm_cnn(dict(config)).eval()
    randomize_bn_stats(oracle, seed=15)
    _compare_with_flax(config, oracle, img=triplets, meta=meta)


def test_reference_um_cnn_oracle(ref, real_alerts):
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, _ = real_alerts
    config = normalize_config({
        "model_name": "um_cnn", "train_data_version": "v10",
        "metadata_cols": _REAL_META_COLS,
        "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
        "conv_dropout1": 0.5, "conv_dropout2": 0.55,
        "fc1_neurons": 64, "fc2_neurons": 16, "dropout": 0.4,
    })
    torch.manual_seed(52)
    oracle = ref.architectures.um_cnn(dict(config)).eval()
    randomize_bn_stats(oracle, seed=16)
    _compare_with_flax(config, oracle, img=triplets)


def test_reference_um_nn_oracle(ref, real_alerts):
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    _, meta = real_alerts
    config = normalize_config({
        "model_name": "um_nn", "train_data_version": "v10",
        "metadata_cols": _REAL_META_COLS,
        "meta_fc1_neurons": 64, "meta_fc2_neurons": 32, "meta_dropout": 0.3,
    })
    torch.manual_seed(53)
    oracle = ref.architectures.um_nn(dict(config)).eval()
    randomize_bn_stats(oracle, seed=17)
    _compare_with_flax(config, oracle, meta=meta)


# ------------------- timm-backed families: surgery glue --------------------
# The stub timm.create_model returns a mirror *backbone* shaped like timm's
# (stem/stages + a timm-style .head with global_pool/norm/flatten/
# in_features/fc); the reference's own __init__ then performs its head
# surgery on it and the reference's forward runs it.  Everything the
# reference authored is reference-executed.

def _fake_timm_convnext():
    import torch.nn as nn

    from torch_mirrors import GlobalAvgPool2d, LayerNorm2d, TimmStyleConvNeXt

    class FakeNormMlpHead(nn.Module):
        """timm NormMlpClassifierHead surface: the attributes the
        reference's surgery composes (architectures.py:109-119,134-143)."""

        def __init__(self, dim):
            super().__init__()
            self.global_pool = GlobalAvgPool2d()
            self.norm = LayerNorm2d(dim, eps=1e-6)
            self.flatten = nn.Flatten(1)
            self.fc = nn.Linear(dim, 1000)
            self.in_features = dim

        def forward(self, x):
            return self.fc(self.flatten(self.norm(self.global_pool(x))))

    class FakeTimmConvNeXt(TimmStyleConvNeXt):
        def __init__(self):
            super().__init__(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512))
            self.head = FakeNormMlpHead(512)

        def forward(self, x):
            return self.head(self.stages(self.stem(x)))

    return FakeTimmConvNeXt


def _with_create_model(ref, factory):
    def create_model(model_kind, pretrained=True):
        assert pretrained is False, \
            "tests must pass pretrained=False (no downloads)"
        return factory()
    ref.timm.create_model = create_model


def test_reference_convnext_head_surgery(ref, real_alerts):
    """Image-only ConvNeXt: the reference's 9-element head Sequential
    (architectures.py:104-122) built on a stub backbone."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, _ = real_alerts
    _with_create_model(ref, _fake_timm_convnext())
    config = normalize_config({
        "model_name": "ConvNeXt", "model_kind": "convnext_pico.d1_in1k",
        "train_data_version": "v10", "metadata_cols": _REAL_META_COLS,
        "pretrained": False,
        "fc1_neurons": 64, "fc2_neurons": 16, "dropout": 0.4,
    })
    torch.manual_seed(54)
    oracle = ref.architectures.ConvNeXt(dict(config)).eval()
    randomize_bn_stats(oracle, seed=18)
    _compare_with_flax(config, oracle, img=triplets)


def test_reference_mm_convnext_glue(ref, real_alerts):
    """mm_ConvNeXt: reference head-flatten surgery + metadata branch +
    combined head (architectures.py:125-171), non-LS variant."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, meta = real_alerts
    _with_create_model(ref, _fake_timm_convnext())
    config = normalize_config({
        "model_name": "mm_ConvNeXt", "model_kind": "convnext_pico.d1_in1k",
        "train_data_version": "v10", "metadata_cols": _REAL_META_COLS,
        "pretrained": False,
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.25,
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32, "comb_dropout": 0.2,
    })
    torch.manual_seed(55)
    oracle = ref.architectures.mm_ConvNeXt(dict(config)).eval()
    randomize_bn_stats(oracle, seed=19)
    _compare_with_flax(config, oracle, img=triplets, meta=meta)


def _fake_timm_maxvit():
    import torch.nn as nn

    from torch_maxvit_mirror import GlobalAvgPoolFlat, TimmStyleMaxViT

    class FakeMaxViTHead(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.global_pool = GlobalAvgPoolFlat()
            self.fc = nn.Linear(dim, 1000)
            self.in_features = dim

        def forward(self, x):
            return self.fc(self.global_pool(x))

    class FakeTimmMaxViT(TimmStyleMaxViT):
        def __init__(self):
            super().__init__(depths=(1, 1), dims=(32, 64), stem_width=32,
                             window=2)
            self.head = FakeMaxViTHead(64)

        def forward(self, x):
            return self.head(self.stages(self.stem(x)))

    return FakeTimmMaxViT


MAXVIT_TINY_SPEC = {"depths": (1, 1), "dims": (32, 64), "stem_width": 32}

MAXVIT_CFG = {
    # _64. → get_model_image_size resolves 64 (architectures.py:10-22),
    # matching the flax model's in-graph resize target
    "model_kind": "maxvit_tiny_rw_64.test",
    "train_data_version": "v10", "metadata_cols": META_COLS,
    "pretrained": False,
    "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.3,
    "meta_fc1_neurons": 16, "meta_fc2_neurons": 16, "meta_dropout": 0.25,
    "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
}


@pytest.fixture
def tiny_maxvit(monkeypatch):
    from btsbot_tpu.models import maxvit as maxvit_mod

    monkeypatch.setitem(maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny",
                        MAXVIT_TINY_SPEC)


def _rand_maxvit_inputs(seed):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(2, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 25)).astype(np.float32)
    return img, meta


def _spice_relpos(oracle):
    import torch

    for name, p in oracle.named_parameters():
        if "relative_position_bias_table" in name:
            torch.nn.init.normal_(p, std=0.5)


def test_reference_maxvit_head_surgery(ref, tiny_maxvit):
    """Image-only MaxViT: reference resize + head Sequential surgery
    (architectures.py:25-51) on a stub backbone."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    _with_create_model(ref, _fake_timm_maxvit())
    config = normalize_config({**MAXVIT_CFG, "model_name": "MaxViT"})
    torch.manual_seed(56)
    oracle = ref.architectures.MaxViT(dict(config)).eval()
    assert oracle.image_size == 64
    randomize_bn_stats(oracle, seed=20)
    _spice_relpos(oracle)
    img, _ = _rand_maxvit_inputs(seed=5)
    _compare_with_flax(config, oracle, img=img)


def test_reference_mm_maxvit_glue(ref, tiny_maxvit):
    """mm_MaxViT: reference pool-only surgery + fusion glue
    (architectures.py:54-101)."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    _with_create_model(ref, _fake_timm_maxvit())
    config = normalize_config({**MAXVIT_CFG, "model_name": "mm_MaxViT"})
    torch.manual_seed(57)
    oracle = ref.architectures.mm_MaxViT(dict(config)).eval()
    assert oracle.image_size == 64
    randomize_bn_stats(oracle, seed=21)
    _spice_relpos(oracle)
    img, meta = _rand_maxvit_inputs(seed=6)
    _compare_with_flax(config, oracle, img=img, meta=meta)


# --------------------------- frozen_fusion --------------------------------

def test_reference_frozen_fusion_oracle(ref, real_alerts, tmp_path):
    """The reference's full fusion path: um_cnn + um_nn checkpoints written
    to reference-convention run dirs (report.json + best_model.pth), loaded
    through the reference's OWN ``load_BTSbot_model`` + head-surgery
    (architectures.py:296-372), then converted and matched by our flax
    frozen_fusion."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, meta = real_alerts

    img_cfg = {
        "model_name": "um_cnn", "train_data_version": "v10",
        "metadata_cols": _REAL_META_COLS,
        "conv1_channels": 16, "conv2_channels": 16, "conv_kernel": 5,
        "conv_dropout1": 0.1, "conv_dropout2": 0.1,
        "fc1_neurons": 16, "fc2_neurons": 8, "dropout": 0.2,
    }
    meta_cfg = {
        "model_name": "um_nn", "train_data_version": "v10",
        "metadata_cols": _REAL_META_COLS,
        "meta_fc1_neurons": 32, "meta_fc2_neurons": 16, "meta_dropout": 0.1,
    }

    # reference-convention branch run dirs, written with reference models
    for cfg, seed in ((img_cfg, 61), (meta_cfg, 62)):
        d = tmp_path / cfg["model_name"]
        d.mkdir()
        torch.manual_seed(seed)
        branch = getattr(ref.architectures, cfg["model_name"])(dict(cfg))
        randomize_bn_stats(branch, seed=seed)
        torch.save(branch.state_dict(), d / "best_model.pth")
        (d / "report.json").write_text(json.dumps({"train_config": cfg}))

    fusion_cfg_dict = {
        "model_name": "frozen_fusion", "train_data_version": "v10",
        "metadata_cols": _REAL_META_COLS,
        "image_model_dir": str(tmp_path / "um_cnn"),
        "meta_model_dir": str(tmp_path / "um_nn"),
        "comb_fc1_neurons": 16, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
    }
    torch.manual_seed(63)
    oracle = ref.architectures.frozen_fusion(dict(fusion_cfg_dict)).eval()
    config = normalize_config(fusion_cfg_dict)
    _compare_with_flax(config, oracle, img=triplets, meta=meta)


# --------------------------- split engine ---------------------------------

def _synthetic_base_set(set_name, n_objects, seed, label):
    """Synthetic (triplets, candidates) base data in the reference's base
    file schema (objectId/jd/magpsf/peakmag/fid/isdiffpos/sgscore1,2)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for o in range(n_objects):
        objid = f"ZTF{set_name[:2]}{o:04d}"
        n_alerts = int(rng.integers(1, 9))
        jd0 = 2459500.0 + float(rng.uniform(0, 500))
        mags = rng.uniform(16.5, 20.5, n_alerts)
        peak = float(mags.min() - rng.uniform(0.0, 0.3))
        for a in range(n_alerts):
            rows.append({
                "objectId": objid,
                "jd": jd0 + a * float(rng.uniform(0.5, 3.0)),
                "magpsf": float(mags[a]),
                "peakmag": peak,
                "fid": int(rng.choice([1, 2, 3])),
                "isdiffpos": str(rng.choice(["t", "f"], p=[0.9, 0.1])),
                "sgscore1": float(rng.choice([-999.0, rng.uniform(0, 1)],
                                             p=[0.1, 0.9])),
                "sgscore2": float(rng.choice([-999.0, rng.uniform(0, 1)],
                                             p=[0.1, 0.9])),
                "label": label,
            })
    cand = pd.DataFrame(rows)
    trips = rng.normal(size=(len(cand), 5, 5, 3)).astype(np.float32)
    return trips, cand


def test_reference_split_engine_bit_parity(ref, tmp_path, monkeypatch):
    """Run the reference's ACTUAL split engine (cut_set_and_assign_splits →
    merge_sets_across_split → create_subset) on synthetic base data and
    assert our data/splits.build_dataset_files reproduces every output file
    bit-for-bit (triplet arrays) / value-for-value (candidate tables)."""
    import pandas as pd

    from btsbot_tpu.data.splits import build_dataset_files, create_cuts_str

    spec = importlib.util.spec_from_file_location(
        "ref_train_val_test_split",
        os.path.join(REF_DIR, "query_data", "train_val_test_split.py"))
    tvts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tvts)

    version = "vt"
    set_names = ["trues", "dims", "vars", "rejects"]
    base = tmp_path / "data" / "base_data"
    base.mkdir(parents=True)
    work = tmp_path / "work"
    work.mkdir()

    for i, name in enumerate(set_names):
        label = 1 if name == "trues" else 0
        trips, cand = _synthetic_base_set(name, n_objects=25, seed=100 + i,
                                          label=label)
        np.save(base / f"{name}_triplets.npy", trips)
        cand.to_csv(base / f"{name}_candidates.csv", index=False)
    # dims type table for the is_SN relabeling (reference :146-156)
    dims_ids = pd.read_csv(base / "dims_candidates.csv")["objectId"].unique()
    pd.DataFrame({
        "ZTFID": dims_ids,
        "type": np.where(np.arange(len(dims_ids)) % 3 == 0, "AGN", "SN II"),
    }).to_csv(base / "dims.csv", index=False)

    # --- reference run (cwd-relative ../data paths) ---
    monkeypatch.chdir(work)
    for name in set_names:
        tvts.cut_set_and_assign_splits(name, tvts.only_pd_gr_ps,
                                       version_name=version)
    for split in ("train", "val", "test"):
        # reference wart: merge_sets_across_split takes seed=2 but never
        # seeds — pin the ambient RNG state it actually consumes
        np.random.seed(2)
        tvts.merge_sets_across_split(set_names, split, version)
        tvts.create_subset(split, version_name=version, N_max_p=100,
                           N_max_n=100)
    monkeypatch.chdir(tmp_path)

    # --- our run, same base data ---
    out = tmp_path / "ours"
    build_dataset_files(str(base), str(out), set_names, version,
                        N_max_p=100, N_max_n=100)

    cuts = create_cuts_str(100, 100, False, True, False)
    assert cuts == "_N100"
    for split in ("train", "val", "test"):
        for suffix in ("", cuts):
            ref_trips = np.load(
                tmp_path / "data" / f"{split}_triplets_{version}{suffix}.npy")
            got_trips = np.load(
                out / f"{split}_triplets_{version}{suffix}.npy")
            np.testing.assert_array_equal(got_trips, ref_trips,
                                          err_msg=f"{split}{suffix}")
            ref_cand = pd.read_csv(
                tmp_path / "data" / f"{split}_cand_{version}{suffix}.csv")
            got_cand = pd.read_csv(
                out / f"{split}_cand_{version}{suffix}.csv")
            pd.testing.assert_frame_equal(got_cand, ref_cand,
                                          check_dtype=False)


# --------------------------- policy replay --------------------------------

def _policy_fixture(seed=7, n_objects=60):
    """Synthetic validation split with realistic follow-up structure:
    per-object constant label/peakmag, chronological alerts, scores
    correlated with the label so every policy has TPs and TNs."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    save_times, trigger_times = {}, {}
    for o in range(n_objects):
        objid = f"ZTFP{o:04d}"
        label = int(o % 2 == 0)
        n_alerts = int(rng.integers(1, 9))
        jd0 = 2459400.0 + float(rng.uniform(0, 600))
        peak = float(rng.uniform(17.0, 19.2))
        for a in range(n_alerts):
            mag = float(np.clip(peak + rng.uniform(0, 2.2), 16.0, 21.0))
            score = float(np.clip(
                (0.8 if label else 0.15) + rng.normal(0, 0.25), 0.0, 1.0))
            rows.append({"objectId": objid, "jd": jd0 + a * 1.7,
                         "magpsf": mag, "peakmag": peak, "label": label,
                         "raw_preds": score})
        if label and rng.random() < 0.8:
            save_times[objid] = jd0 + float(rng.uniform(-3, 6))
            trigger_times[objid] = jd0 + float(rng.uniform(-3, 6))
    cand = pd.DataFrame(rows)
    junk_ids = [f"ZTFP{o:04d}" for o in range(0, n_objects, 13)]
    return cand, save_times, trigger_times, junk_ids


def _nanclose(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape
    both_nan = np.isnan(a) & np.isnan(b)
    np.testing.assert_allclose(a[~both_nan], b[~both_nan], rtol=1e-12)


def test_reference_policy_replay_oracle(ref, tmp_path, monkeypatch):
    """val.py's diagnostic_fig — the reference's per-object chronological
    policy replay, object selection, binned purity/completeness and
    save/trigger latency loops (val.py:400-683) — executed as the oracle
    for metrics/policy.py's vectorized replay and for roc_auc/alert
    metrics."""
    import pandas as pd

    from btsbot_tpu.metrics.classification import alert_metrics, roc_auc
    from btsbot_tpu.metrics.policy import policy_performance, replay_policies

    cand, save_times, trigger_times, junk_ids = _policy_fixture()

    # reference inputs: cand CSV + cwd-relative base-data tables
    base = tmp_path / "data" / "base_data"
    base.mkdir(parents=True)
    pd.DataFrame({
        "ZTFID": list(save_times),
        "RCF_save_time": [save_times[k] for k in save_times],
        "RCF_trigger_time": [trigger_times[k] for k in trigger_times],
    }).to_csv(base / "trues.csv", index=False)
    pd.DataFrame({"id": junk_ids}).to_csv(
        base / "RCFJunk_Feb21_2025.csv", index=False)
    cand_path = tmp_path / "val_cand.csv"
    cand.drop(columns=["raw_preds"]).to_csv(cand_path, index=False)
    outdir = tmp_path / "run"
    outdir.mkdir()

    monkeypatch.chdir(tmp_path)
    run_data = {
        "raw_preds": cand["raw_preds"].to_numpy(),
        "labels": cand["label"].to_numpy(),
        "run_name": "oracle",
    }
    perf = ref.val.diagnostic_fig(run_data, str(cand_path), str(outdir))

    import matplotlib.pyplot as plt

    plt.close(perf.pop("fig", None))

    # ---- our side ----
    replay = replay_policies(
        cand["objectId"].to_numpy(), cand["jd"].to_numpy(),
        cand["magpsf"].to_numpy(), cand["raw_preds"].to_numpy(),
        cand["label"].to_numpy(), peakmag=cand["peakmag"].to_numpy(),
        junk_ids=junk_ids)
    ours = policy_performance(replay, save_times=save_times,
                              trigger_times=trigger_times)

    assert np.isclose(perf["roc_auc"],
                      roc_auc(run_data["labels"], run_data["raw_preds"]))
    am = alert_metrics(run_data["labels"], run_data["raw_preds"])
    for key in ("bal_acc", "bts_acc", "notbts_acc", "alert_precision",
                "alert_recall"):
        assert np.isclose(perf[key], am[key]), key

    for name in ("bts_p1", "bts_p2", "prod_p1", "prod_p2"):
        want = perf["policy_performance"][name]
        got = ours[name]
        assert np.isclose(got["policy_precision"],
                          want["policy_precision"]), name
        assert np.isclose(got["policy_recall"], want["policy_recall"]), name
        _nanclose(got["binned_precision"], want["binned_precision"])
        _nanclose(got["binned_recall"], want["binned_recall"])
        np.testing.assert_allclose(got["peakmag_bins"],
                                   want["peakmag_bins"])
        assert np.isclose(got["med_save_dt"], want["med_save_dt"]), name
        assert np.isclose(got["med_trigger_dt"], want["med_trigger_dt"]), name


def test_reference_mm_convnext_ls_variant_glue(ref, real_alerts):
    """The LS branch of mm_ConvNeXt's surgery (architectures.py:136-141:
    head keeps pool+norm+flatten when "LS" in train_data_version) executed
    by the reference's own __init__ on the stub backbone."""
    import torch

    from btsbot_tpu import normalize_config
    from torch_mirrors import randomize_bn_stats

    triplets, meta = real_alerts
    _with_create_model(ref, _fake_timm_convnext())
    config = normalize_config({
        "model_name": "mm_ConvNeXt", "model_kind": "convnext_pico.d1_in1k",
        "train_data_version": "v10LS", "metadata_cols": _REAL_META_COLS,
        "pretrained": False,
        "meta_fc1_neurons": 64, "meta_fc2_neurons": 64, "meta_dropout": 0.25,
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32, "comb_dropout": 0.2,
    })
    torch.manual_seed(58)
    oracle = ref.architectures.mm_ConvNeXt(dict(config)).eval()
    randomize_bn_stats(oracle, seed=22)
    _compare_with_flax(config, oracle, img=triplets, meta=meta)
