"""Head-to-head trainer-quality parity vs the reference's OWN trainer.

The parity suite proves forward-pass bit-parity (tests/test_reference_
oracle.py), but until now the rebuilt *trainer* (pos-weighted BCE, AdamW,
warmup->cosine schedule, 0.5%-margin early stop, flip/rot augmentation) had
never been shown to reach the same quality as the reference trainer on
identical data (VERDICT r3 "what's weak" #3).  This script closes that:

* imports the reference's executable ``run_training``
  (/root/reference/btsbot/train.py:75-478) with its absent third-party deps
  stubbed (wandb, timm, generate_embeddings) and a faithful functional
  implementation of the torchvision.transforms.v2 surface it uses
  (ToDtype / RandomHorizontalFlip / RandomVerticalFlip / Compose /
  functional.rotate for right angles) — torchvision is not installed here;
* materialises the SAME synthetic hard-benchmark fixture
  (scripts/quality_run.make_dataset) both as reference-convention files
  (data/{split}_cand_{v}_N100.csv + triplets .npy, base_data tables for
  val.py:384-390) and as in-memory AlertDatasets;
* runs both trainers over several seeds with identical hyperparameters and
  records best-val ROC-AUC / balanced accuracy / val loss per run in
  docs/trainer_parity.json.

Environmental adaptations (semantics-neutral, documented):
* DataLoader workers forced to 0 (train.py:206 hardcodes num_workers=6;
  this host has one core and no shm budget) — batch content/order is
  unchanged, only the processes that produce it.
* matplotlib forced to Agg (reference imports pyplot at module scope).

Run:  python scripts/trainer_parity.py [--objects 400] [--epochs 15]
          [--seeds 0,1,2] [--models mm_cnn,um_nn] [--out docs]
"""

from __future__ import annotations

import argparse
import contextlib
import importlib
import io
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single source of truth for the fixture's metadata columns — the fixtures
# come from quality_run.make_dataset, which populates exactly these
from quality_run import META_COLS  # noqa: E402

REF_DIR = "/root/reference/btsbot"

# Hyperparameters shared verbatim by both trainers for every run.
COMMON_HP = {
    "train_data_version": "vp",
    "learning_rate": 5e-4, "beta_1": 0.9, "beta_2": 0.999,
    "batch_size": 128, "warmup_epochs": 2, "patience": 6,
    "N_max": 100, "use_test_split": False, "testing": True,
    "data_aug_h_flip": True, "data_aug_v_flip": True, "data_aug_rot": True,
}

ARCHS = {
    # prod-config mm_cnn (train_configs/mm_cnn.json shapes)
    "mm_cnn": {
        "model_name": "mm_cnn",
        "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
        "conv_dropout1": 0.5, "conv_dropout2": 0.55,
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.3,
        "comb_fc1_neurons": 256, "comb_fc2_neurons": 32,
        "comb_dropout": 0.4,
    },
    "um_cnn": {
        "model_name": "um_cnn",
        "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
        "conv_dropout1": 0.5, "conv_dropout2": 0.55,
        "fc1_neurons": 256, "fc2_neurons": 32, "dropout": 0.4,
    },
    "um_nn": {
        "model_name": "um_nn",
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.3,
    },
    # timm-backed flagship (VERDICT r4 #3): the reference's run_training
    # executes with the builder's torch ConvNeXt mirror installed as the
    # stub timm.create_model backbone — exactly the test_reference_oracle
    # trick — so the reference's head surgery, freeze logic, and training
    # loop all run reference-authored; only the (downloaded, not
    # reference-authored) timm internals are mirror-defined.
    "mm_ConvNeXt": {
        "model_name": "mm_ConvNeXt",
        "model_kind": "convnext_pico.d1_in1k", "pretrained": False,
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.25,
        "comb_fc1_neurons": 256, "comb_fc2_neurons": 32,
        "comb_dropout": 0.2,
    },
    # two-stage workflow (architectures.py:296-372 + train.py:224-236, the
    # riskiest untested trainer path: branch loading + freeze masking).
    # Branch runs (um_cnn + um_nn, same seed) are trained per side first;
    # each side fuses its OWN branch run dirs.
    "frozen_fusion": {
        "model_name": "frozen_fusion",
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32, "comb_dropout": 0.2,
    },
}

# models whose reference class calls timm.create_model — these runs install
# the torch mirror backbone as the stub factory
TIMM_BACKED = {"mm_ConvNeXt"}


def _mirror_create_model():
    """timm.create_model stand-in returning the builder's torch ConvNeXt
    mirror with a timm-style NormMlpClassifierHead surface (the attributes
    the reference's surgery composes — architectures.py:109-119,134-143)."""
    import torch.nn as nn

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from torch_mirrors import (GlobalAvgPool2d, LayerNorm2d,
                               TimmStyleConvNeXt)

    class FakeNormMlpHead(nn.Module):
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

    def create_model(model_kind, pretrained=True):
        assert pretrained is False, \
            "parity runs must pass pretrained=False (no downloads here)"
        assert "convnext_pico" in model_kind, model_kind
        return FakeTimmConvNeXt()

    return create_model


# --------------------------------------------------------------------------
# torchvision.transforms.v2 functional stand-ins.  Only the five names the
# reference trainer touches (train.py:185-191, utils.py:44-48); each is a
# faithful implementation of the torchvision op for CHW tensors.
# --------------------------------------------------------------------------

def _build_transforms_stub():
    import torch

    class Compose:
        def __init__(self, ts):
            self.ts = list(ts)

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToDtype:
        def __init__(self, dtype, scale=False):
            assert not scale
            self.dtype = dtype

        def __call__(self, x):
            return x.to(self.dtype)

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, x):
            if torch.rand(1).item() < self.p:
                return torch.flip(x, dims=[-1])
            return x

    class RandomVerticalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, x):
            if torch.rand(1).item() < self.p:
                return torch.flip(x, dims=[-2])
            return x

    def rotate(img, angle):
        # RandomRightAngleRotation only ever passes multiples of 90
        # (utils.py:46); torchvision rotates CCW for positive angles, which
        # for exact right angles is torch.rot90 in the (H, W) plane —
        # dims=[-2,-1] matches np.rot90's CCW (dims=[-1,-2] would be CW;
        # immaterial to parity stats since angles are uniform over
        # {0,90,180,270}, but the stub should match torchvision exactly).
        k = int(angle) // 90 % 4
        return torch.rot90(img, k, dims=[-2, -1])

    from importlib.machinery import ModuleSpec

    def _mod(name, is_pkg=False):
        m = types.ModuleType(name)
        m.__spec__ = ModuleSpec(name, loader=None, is_package=is_pkg)
        if is_pkg:
            m.__path__ = []
        return m

    tv = _mod("torchvision", is_pkg=True)
    tvt = _mod("torchvision.transforms", is_pkg=True)
    v2 = _mod("torchvision.transforms.v2")
    fn = _mod("torchvision.transforms.v2.functional")
    fn.rotate = rotate
    v2.Compose = Compose
    v2.ToDtype = ToDtype
    v2.RandomHorizontalFlip = RandomHorizontalFlip
    v2.RandomVerticalFlip = RandomVerticalFlip
    v2.functional = fn
    tvt.v2 = v2
    tv.transforms = tvt
    return {"torchvision": tv, "torchvision.transforms": tvt,
            "torchvision.transforms.v2": v2,
            "torchvision.transforms.v2.functional": fn}


@contextlib.contextmanager
def reference_trainer(create_model=None):
    """Import the reference's train.py (+val/utils/architectures) with the
    absent deps stubbed; yields the train module.  Restores sys state.
    ``create_model`` installs a timm.create_model factory for timm-backed
    families (None for the plain-torch families, which never call it)."""
    from importlib.machinery import ModuleSpec

    names = ("timm", "wandb", "generate_embeddings", "utils",
             "architectures", "val", "train",
             "torchvision", "torchvision.transforms",
             "torchvision.transforms.v2",
             "torchvision.transforms.v2.functional")
    saved = {n: sys.modules.pop(n, None) for n in names}

    stubs = _build_transforms_stub()
    for extra in ("timm", "wandb", "generate_embeddings"):
        m = types.ModuleType(extra)
        m.__spec__ = ModuleSpec(extra, loader=None)
        stubs[extra] = m
    stubs["timm"].create_model = create_model    # None for plain-torch models
    stubs["generate_embeddings"].get_torch_embedding = None  # gated off
    # testing=True keeps every wandb call unreached (train.py:274-279)

    import matplotlib

    matplotlib.use("Agg", force=True)
    sys.modules.update(stubs)
    sys.path.insert(0, REF_DIR)
    prev_dwb = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # no __pycache__ inside /root/reference
    try:
        train = importlib.import_module("train")
        val = importlib.import_module("val")

        # single-core host: run the hardcoded 6/4-worker DataLoaders
        # in-process (identical batches, no worker pool)
        from torch.utils.data import DataLoader as TorchDataLoader

        def serial_loader(*a, **kw):
            kw["num_workers"] = 0
            kw.pop("prefetch_factor", None)
            kw["pin_memory"] = False
            return TorchDataLoader(*a, **kw)

        train.DataLoader = serial_loader
        val.DataLoader = serial_loader
        yield train
    finally:
        sys.path.remove(REF_DIR)
        sys.dont_write_bytecode = prev_dwb
        for n in names:
            sys.modules.pop(n, None)
            if saved[n] is not None:
                sys.modules[n] = saved[n]


# --------------------------------------------------------------------------
# Fixture materialisation
# --------------------------------------------------------------------------

def _with_peakmag(cand):
    cand = cand.copy()
    cand["peakmag"] = cand.groupby("objectId")["magpsf"].transform("min")
    # reference policy replay bit-ands labels with preds (val.py:506)
    cand["label"] = cand["label"].astype(np.int64)
    return cand


def write_reference_files(workdir, splits, version, meta_cols):
    """Write AlertDatasets in the reference's on-disk convention
    (train.py:133-141, val.py:82-92, val.py:384-390)."""
    import pandas as pd

    data = os.path.join(workdir, "data")
    base = os.path.join(data, "base_data")
    os.makedirs(base, exist_ok=True)
    for split, ds in splits.items():
        cand = _with_peakmag(ds.candidates)
        cand.to_csv(os.path.join(data, f"{split}_cand_{version}_N100.csv"),
                    index=False)
        np.save(os.path.join(data, f"{split}_triplets_{version}_N100.npy"),
                np.asarray(ds.images, np.float32))
    # follow-up tables for the policy replay: synthetic fixture has no RCF
    # history — every positive counts as saved/triggered at first alert
    val_cand = _with_peakmag(splits["val"].candidates)
    pos = val_cand[val_cand["label"] == 1]
    first_jd = pos.groupby("objectId")["jd"].min()
    pd.DataFrame({
        "ZTFID": first_jd.index,
        "RCF_save_time": first_jd.to_numpy(),
        "RCF_trigger_time": first_jd.to_numpy(),
    }).to_csv(os.path.join(base, "trues.csv"), index=False)
    pd.DataFrame({"id": []}).to_csv(
        os.path.join(base, "RCFJunk_Feb21_2025.csv"), index=False)


# --------------------------------------------------------------------------
# One run per (trainer, model, seed)
# --------------------------------------------------------------------------

def _ref_run_dir(workdir, model):
    return os.path.join(
        workdir, "models", f"{model}_{COMMON_HP['train_data_version']}"
        f"_N100_cpu", "testing")


def run_reference(workdir, model, seed, epochs, quiet=True, extra=None):
    """Reference trainer in workdir; returns {roc_auc, bal_acc, val_loss,
    epochs_ran, wall_s}."""
    import torch

    config = {**COMMON_HP, **ARCHS[model], **(extra or {}),
              "epochs": epochs, "random_seed": seed,
              "metadata_cols": META_COLS}
    # the reference seeds numpy + CUDA but not torch CPU (train.py:106-107)
    # — pin it here so each (model, seed) run is reproducible
    torch.manual_seed(seed)
    factory = _mirror_create_model() if model in TIMM_BACKED else None
    prev_cwd = os.getcwd()
    os.chdir(workdir)
    t0 = time.time()
    try:
        with reference_trainer(create_model=factory) as train:
            sink = io.StringIO() if quiet else sys.stdout
            with contextlib.redirect_stdout(sink):
                train.run_training(dict(config))
    finally:
        os.chdir(prev_cwd)
    wall = time.time() - t0
    report_path = os.path.join(_ref_run_dir(workdir, model), "report.json")
    with open(report_path) as f:
        report = json.load(f)
    hist = report["Training history"]
    # trailing zeros in the padded arrays = epochs never run (train.py:291)
    val_loss = [v for v in hist["val_loss"] if v != 0.0]
    summ = report["val_summary"]
    return {"roc_auc": summ["roc_auc"], "bal_acc": summ["bal_acc"],
            "val_loss": min(val_loss), "epochs_ran": len(val_loss),
            "wall_s": round(wall, 1)}


def run_ours(out_root, model, seed, epochs, splits, extra=None):
    from btsbot_tpu import normalize_config
    from btsbot_tpu.engine.train import run_training

    cfg = normalize_config({
        **COMMON_HP, **ARCHS[model], **(extra or {}),
        "epochs": epochs, "random_seed": seed,
        "metadata_cols": META_COLS,
    })
    t0 = time.time()
    result = run_training(
        cfg, run_name=f"parity_{model}_s{seed}", out_root=out_root,
        train_ds=splits["train"], val_ds=splits["val"],
        make_figure=False, log=lambda m: None)
    wall = time.time() - t0
    summ = result["summaries"]["val"]
    return {"roc_auc": summ["roc_auc"], "bal_acc": summ["bal_acc"],
            "val_loss": min(result["history"]["val_loss"]),
            "epochs_ran": len(result["history"]["val_loss"]),
            "wall_s": round(wall, 1),
            "_model_dir": result["model_dir"]}


def run_reference_fusion(workdir, seed, epochs, quiet=True):
    """frozen_fusion, reference side: train um_cnn + um_nn branches at this
    seed (reference trainer, same fixture), then fuse their run dirs and
    train the combined head with the branches frozen (train.py:224-231)."""
    for branch in ("um_cnn", "um_nn"):
        run_reference(workdir, branch, seed, epochs, quiet=quiet)
    extra = {"image_model_dir": _ref_run_dir(workdir, "um_cnn"),
             "meta_model_dir": _ref_run_dir(workdir, "um_nn")}
    return run_reference(workdir, "frozen_fusion", seed, epochs,
                         quiet=quiet, extra=extra)


def run_ours_fusion(out_root, seed, epochs, splits):
    """frozen_fusion, our side: same two-stage workflow on OUR trainer's
    branch run dirs."""
    dirs = {}
    for branch in ("um_cnn", "um_nn"):
        dirs[branch] = run_ours(out_root, branch, seed, epochs,
                                splits)["_model_dir"]
    extra = {"image_model_dir": dirs["um_cnn"],
             "meta_model_dir": dirs["um_nn"]}
    return run_ours(out_root, "frozen_fusion", seed, epochs, splits,
                    extra=extra)


def _agg(runs):
    aucs = [r["roc_auc"] for r in runs]
    return {"roc_auc_mean": float(np.mean(aucs)),
            "roc_auc_std": float(np.std(aucs)),
            "roc_auc_min": float(np.min(aucs)),
            "roc_auc_max": float(np.max(aucs))}


# --------------------------------------------------------------------------
# Per-seed sidecar: every completed (model, side, seed) run is persisted to
# <workdir>/partial_results.json immediately, and a restarted invocation
# resumes from it.  Individual legs are 10-70 min on this single-core host;
# without this, a mid-run kill loses whole seeds (it lost frozen_fusion
# seeds 0-1 once — the runs finished but only their stdout had the numbers).
# --------------------------------------------------------------------------

def _sidecar_path(workdir):
    return os.path.join(workdir, "partial_results.json")


def _sidecar_load(workdir):
    path = _sidecar_path(workdir)
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _sidecar_put(workdir, partial, model, side, seed, result):
    result = {k: v for k, v in result.items() if not k.startswith("_")}
    partial.setdefault(model, {}).setdefault(side, {})[str(seed)] = result
    tmp = _sidecar_path(workdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(partial, f, indent=1)
    os.replace(tmp, _sidecar_path(workdir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--objects", type=int, default=400)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--models", default="mm_cnn,um_nn")
    p.add_argument("--out", default="docs")
    p.add_argument("--workdir", default="/tmp/trainer_parity")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # identical hardware per side

    from quality_run import make_dataset

    seeds = [int(s) for s in args.seeds.split(",")]
    models = args.models.split(",")

    t0 = time.time()
    splits = {
        "train": make_dataset(args.objects, (4, 12), seed=0, hard=True),
        "val": make_dataset(max(args.objects // 4, 40), (4, 12), seed=1,
                            hard=True),
    }
    print(f"fixture: {len(splits['train'])} train / {len(splits['val'])} "
          f"val alerts ({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(args.workdir, exist_ok=True)
    write_reference_files(args.workdir, splits,
                          COMMON_HP["train_data_version"], META_COLS)

    results = {"fixture": {"objects": args.objects, "benchmark": "hard",
                           "train_alerts": len(splits["train"]),
                           "val_alerts": len(splits["val"]),
                           "epochs": args.epochs, "seeds": seeds,
                           "hyperparams": {k: v for k, v in COMMON_HP.items()
                                           if k != "testing"}},
               "models": {}}
    partial = _sidecar_load(args.workdir)
    for model in models:
        ref_runs, our_runs = [], []
        for seed in seeds:
            r = partial.get(model, {}).get("reference", {}).get(str(seed))
            if r is None:
                if model == "frozen_fusion":
                    r = run_reference_fusion(args.workdir, seed, args.epochs,
                                             quiet=not args.verbose)
                else:
                    r = run_reference(args.workdir, model, seed, args.epochs,
                                      quiet=not args.verbose)
                _sidecar_put(args.workdir, partial, model, "reference",
                             seed, r)
            print(f"reference {model} seed={seed}: {json.dumps(r)}",
                  flush=True)
            ref_runs.append(r)
            o = partial.get(model, {}).get("ours", {}).get(str(seed))
            if o is None:
                if model == "frozen_fusion":
                    o = run_ours_fusion(os.path.join(args.workdir, "ours"),
                                        seed, args.epochs, splits)
                else:
                    o = run_ours(os.path.join(args.workdir, "ours"), model,
                                 seed, args.epochs, splits)
                o.pop("_model_dir", None)  # tmp path, not evidence
                _sidecar_put(args.workdir, partial, model, "ours", seed, o)
            print(f"ours      {model} seed={seed}: {json.dumps(o)}",
                  flush=True)
            our_runs.append(o)
        ref_agg, our_agg = _agg(ref_runs), _agg(our_runs)
        # parity = our mean within the cross-seed noise band of the
        # reference (2 sigma, floored at 0.01 for tiny stds) — or better
        noise = max(2 * ref_agg["roc_auc_std"], 0.01)
        delta = our_agg["roc_auc_mean"] - ref_agg["roc_auc_mean"]
        results["models"][model] = {
            "reference": {"runs": ref_runs, **ref_agg},
            "ours": {"runs": our_runs, **our_agg},
            "roc_auc_delta": delta,
            "parity": bool(delta >= -noise),
        }
        print(f"== {model}: ref {ref_agg['roc_auc_mean']:.4f}"
              f"±{ref_agg['roc_auc_std']:.4f}  "
              f"ours {our_agg['roc_auc_mean']:.4f}"
              f"±{our_agg['roc_auc_std']:.4f}  delta {delta:+.4f}  "
              f"parity={results['models'][model]['parity']}", flush=True)
        # persist after EVERY model so a mid-run kill can't lose a
        # finished leg (multi-hour CPU runs; same rationale as
        # quality_run.py's per-model summary.json writes)
        _merge_write(args.out, results, [model])

    print("TRAINER_PARITY_DONE", flush=True)


def _merge_write(out_dir, results, new_models):
    """Merge ``new_models`` of ``results`` into docs/trainer_parity.json.

    Different --models invocations accumulate; fixtures are recorded per
    model so mixed-size runs stay attributable."""
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "trainer_parity.json")
    merged = {"fixture": results["fixture"],
              "models": dict(results["models"])}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        merged_models = dict(prior.get("models", {}))
        for name in new_models:
            merged_models[name] = {**results["models"][name],
                                   "fixture": results["fixture"]}
        merged = {"fixture": prior.get("fixture", results["fixture"]),
                  "models": merged_models}
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (+{','.join(new_models)})", flush=True)


if __name__ == "__main__":
    main()
