"""On-chip training-quality run: prove the engine reaches the quality bar,
not just that losses decrease.

Trains mm_cnn (prod-config architecture) and mm_ConvNeXt on a realistic
synthetic alert dataset (PSF-like transient blobs whose amplitude tracks
the label through a magnitude-like latent, informative + nuisance metadata
columns, per-object alert groups with jd/magpsf light-curve structure so
the policy replay runs), then records ROC-AUC / balanced accuracy / policy
metrics through the full diagnostics stack.  Results land in
docs/quality_run/ (report.json per model + summary.json).

The headline fixture is the HARD benchmark (overlapping magnitude
distributions, non-saturated — ~0.95 ROC-AUC ceiling); ``--easy`` keeps
the earlier separable benchmark for continuity with round-2 artifacts.
NOTE: this is synthetic-data evidence that the training engine reaches the
achievable ceiling of the fixture — it is NOT ROC-AUC parity with the
reference's real trained models, which is unprovable offline (reference
computes the real metrics at val.py:185-221; see interop/manifests.py for
the real-checkpoint closure plan).

Run:  python scripts/quality_run.py [--out docs/quality_run] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

META_COLS = [
    "sgscore1", "distpsnr1", "sgscore2", "distpsnr2", "fwhm", "magpsf",
    "sigmapsf", "chipsf", "ra", "dec", "diffmaglim", "ndethist", "nmtchps",
    "age", "days_since_peak", "days_to_peak", "peakmag_so_far", "new_drb",
    "ncovhist", "nnotdet", "chinr", "sharpnr", "scorr", "sky",
    "maxmag_so_far",
]


def make_dataset(n_objects: int, alerts_per_object: tuple[int, int],
                 seed: int, hard: bool = False, label_noise: float = 0.0):
    """Synthetic-but-realistic alert set: per-object light curves; positives
    (bright transients, peak < 18.5 mag) carry a PSF-like blob whose
    amplitude follows the per-alert magnitude; negatives get fainter,
    noisier residuals.  Overlapping distributions keep it non-trivial.

    ``hard=True`` is the regime where models stop saturating: the magnitude
    distributions overlap heavily (positives 17.5-19.5 vs negatives
    18.0-20.5).  ``label_noise`` flips that fraction of *reported* per-object
    labels after the imagery is drawn (ZTF training sets carry mislabeled
    dims/rejects too) — use it on the train split only, keeping val/test
    labels clean, to measure robustness to annotation noise."""
    import pandas as pd

    from btsbot_tpu.data.dataset import AlertDataset

    rng = np.random.default_rng(seed)
    rows = []
    images = []
    yy, xx = np.mgrid[:63, :63]
    for obj in range(n_objects):
        label = float(rng.random() < 0.45)
        if hard:
            peakmag = rng.uniform(17.5, 19.5) if label \
                else rng.uniform(18.0, 20.5)
        else:
            peakmag = rng.uniform(16.5, 18.4) if label \
                else rng.uniform(18.6, 20.5)
        feat_label = label  # imagery + metadata always follow the truth
        if label_noise and rng.random() < label_noise:
            label = 1.0 - label  # only the reported label is wrong
        n_alerts = rng.integers(*alerts_per_object)
        jd0 = 2459000.0 + rng.uniform(0, 300)
        jds = np.sort(jd0 + rng.uniform(0, 30, n_alerts))
        peak_i = rng.integers(0, n_alerts)
        for i, jd in enumerate(jds):
            mag = peakmag + abs(i - peak_i) * rng.uniform(0.05, 0.4)
            flux = 10 ** (-0.4 * (mag - 20.0))
            # PSF blob + correlated noise; template/difference channels
            cx, cy = 31 + rng.normal(0, 0.5, 2)
            r2 = (xx - cx) ** 2 + (yy - cy) ** 2
            sigma = rng.uniform(1.8, 2.6)
            psf = flux * np.exp(-r2 / (2 * sigma ** 2))
            sci = psf + rng.normal(0, 0.12 * flux + 0.02, (63, 63))
            ref = rng.normal(0, 0.02, (63, 63))
            diff = sci - ref + rng.normal(0, 0.02, (63, 63))
            images.append(np.stack([sci, ref, diff], -1).astype(np.float32))
            meta = {c: rng.normal() for c in META_COLS}
            meta.update({
                "magpsf": mag, "sigmapsf": 1.0857 / max(5.0, flux / 0.02),
                "sgscore1": rng.uniform(0, 0.4) if feat_label
                else rng.uniform(0.2, 1.0),
                "distpsnr1": rng.exponential(2.0 if feat_label else 1.0),
                "fwhm": 2.355 * sigma + rng.normal(0, 0.2),
                "ndethist": i + 1, "ncovhist": i + 3, "nnotdet": 2,
                "age": jd - jds[0],
                "days_since_peak": jd - jds[peak_i],
                "days_to_peak": jds[peak_i] - jd,
                "peakmag_so_far": float(np.min(
                    [peakmag + abs(k - peak_i) * 0.2
                     for k in range(i + 1)])),
                "maxmag_so_far": float(mag + 0.5),
                "new_drb": rng.uniform(0.7, 1.0),
            })
            rows.append({"objectId": f"ZTFsyn{obj:05d}", "candid": len(rows),
                         "jd": jd, "label": label, "is_SN": True,
                         "near_threshold": 18.3 < peakmag < 18.7,
                         "source_set": "trues" if label else "dims",
                         **meta})
    cand = pd.DataFrame(rows)
    trips = np.stack(images)
    # per-cutout L2 norm, as the training .npy convention stores them
    norm = np.sqrt((trips ** 2).sum(axis=(1, 2), keepdims=True))
    trips = trips / np.maximum(norm, 1e-12)
    labels = cand["label"].to_numpy(np.float32)
    return AlertDataset(labels=labels, images=trips,
                        metadata=cand[META_COLS].to_numpy(np.float32),
                        candidates=cand)


CONFIGS = {
    "mm_cnn": {
        "model_name": "mm_cnn",
        "conv1_channels": 32, "conv2_channels": 64, "conv_kernel": 5,
        "conv_dropout1": 0.5, "conv_dropout2": 0.55,
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.3,
        "comb_fc1_neurons": 256, "comb_fc2_neurons": 32,
        "comb_dropout": 0.4,
    },
    "mm_ConvNeXt": {
        "model_name": "mm_ConvNeXt",
        "model_kind": "convnext_pico.d1_in1k",
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.25,
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32,
        "comb_dropout": 0.2,
    },
    # TPU-native serving variant (1.41x ConvNeXt-pico throughput on v5e):
    # same topology, InceptionNeXt token mixer. Quality must match
    # mm_ConvNeXt here before it can be recommended for production.
    "mm_InceptionNeXt": {
        "model_name": "mm_ConvNeXt",
        "model_kind": "inceptionnext_pico",
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.25,
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32,
        "comb_dropout": 0.2,
    },
    # '.r2' halves the block-MLP expansion (the measured 34% serving cost):
    # quality must hold here before recommending it as the fast variant.
    "mm_InceptionNeXt_r2": {
        "model_name": "mm_ConvNeXt",
        "model_kind": "inceptionnext_pico.r2",
        "meta_fc1_neurons": 128, "meta_fc2_neurons": 128,
        "meta_dropout": 0.25,
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32,
        "comb_dropout": 0.2,
    },
    # single-modal references (architectures.py:232-293): quantify what the
    # image/metadata modality alone achieves, and feed the fusion flow below
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
    # the reference's two-stage workflow (architectures.py:296-372): fuse the
    # trained um_cnn + um_nn runs, train only the combined head.  Requires
    # um_cnn and um_nn model dirs — run them first (same --out) or in the
    # same --models list ahead of frozen_fusion.
    "frozen_fusion": {
        "model_name": "frozen_fusion",
        "comb_fc1_neurons": 64, "comb_fc2_neurons": 32, "comb_dropout": 0.2,
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/quality_run")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--objects", type=int, default=2500)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--models", default="mm_cnn,mm_ConvNeXt")
    p.add_argument("--easy", action="store_true",
                   help="Use the separable (near-saturated) benchmark "
                        "instead of the default hard one.  The hard "
                        "benchmark (overlapping magnitude distributions, "
                        "~0.95 ROC-AUC ceiling) is the headline quality "
                        "fixture: the easy one saturates at ~0.999 and "
                        "can't distinguish models (VERDICT r2 weak #3).")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from btsbot_tpu import normalize_config
    from btsbot_tpu.engine.train import run_training

    os.makedirs(args.out, exist_ok=True)
    print(f"device: {jax.devices()[0]}", flush=True)

    hard = not args.easy
    t0 = time.time()
    train_ds = make_dataset(args.objects, (4, 12), seed=0, hard=hard)
    val_ds = make_dataset(args.objects // 8, (4, 12), seed=1, hard=hard)
    test_ds = make_dataset(args.objects // 8, (4, 12), seed=2, hard=hard)
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val / "
          f"{len(test_ds)} test alerts ({time.time() - t0:.0f}s)", flush=True)

    summary_path = os.path.join(args.out, "summary.json")
    prior_models = {}
    if os.path.isfile(summary_path):
        with open(summary_path) as f:
            prior_models = json.load(f).get("models", {})

    summary = {}
    for name in args.models.split(","):
        extra = {}
        if name == "frozen_fusion":
            for dep in ("um_cnn", "um_nn"):
                dep_dir = (summary.get(dep) or prior_models.get(dep)
                           or {}).get("model_dir")
                if not dep_dir or not os.path.isfile(
                        os.path.join(dep_dir, "report.json")):
                    raise SystemExit(
                        f"frozen_fusion needs a trained {dep} run in "
                        f"{args.out} — run --models um_cnn,um_nn first "
                        "(or in the same --models list)")
                extra["image_model_dir" if dep == "um_cnn"
                      else "meta_model_dir"] = dep_dir
        cfg = normalize_config({
            **CONFIGS[name], **extra,
            "train_data_version": "vq", "metadata_cols": META_COLS,
            "learning_rate": 5e-4, "beta_1": 0.9, "beta_2": 0.999,
            "batch_size": 1024, "epochs": args.epochs,
            "warmup_epochs": 2, "patience": 8, "random_seed": 2,
            "use_test_split": True, "device_data": True,
            "device_data_dtype": "bfloat16",  # halve the one-time upload
            "compute_dtype": "bfloat16",
            "data_aug_h_flip": True, "data_aug_v_flip": True,
            "data_aug_rot": True,
        })
        t0 = time.time()
        result = run_training(
            cfg, run_name=f"quality_{name}", out_root=args.out,
            train_ds=train_ds, val_ds=val_ds, test_ds=test_ds,
            make_figure=True, log=lambda m: print(m, flush=True))
        wall = time.time() - t0
        s = {}
        for split in ("val", "test"):
            d = result["summaries"].get(split, {})
            s[split] = {k: d.get(k) for k in
                        ("roc_auc", "bal_acc", "bts_acc", "notbts_acc",
                         "alert_precision", "alert_recall")}
        s["wall_s"] = round(wall, 1)
        s["model_dir"] = result["model_dir"]
        s["epochs_ran"] = len(result["history"]["val_loss"])
        s["benchmark"] = "hard" if hard else "easy"
        summary[name] = s
        print(f"{name}: {json.dumps(s)}", flush=True)

        # merge into any existing summary after EVERY model so a mid-run
        # backend outage doesn't lose the models that already finished,
        # and per-model reruns don't clobber previously recorded models
        merged = {"device": str(jax.devices()[0]), "models": {}}
        if os.path.isfile(summary_path):
            with open(summary_path) as f:
                merged["models"] = json.load(f).get("models", {})
        merged["models"].update(summary)
        with open(summary_path, "w") as f:
            json.dump(merged, f, indent=1)
    print("QUALITY_RUN_DONE", flush=True)


if __name__ == "__main__":
    main()
