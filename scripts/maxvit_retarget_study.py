"""On-chip MaxViT resolution-retarget quality study.

Closes the caveat left by the r3 resolution work (docs/perf_sweep.json
``maxvit_resolution_study_r3``): retargeting a 224-trained MaxViT to a
lower native resolution serves up to 1.58x faster, but "quality must be
re-validated at the new resolution".  This script measures that trade on
real hardware:

1. train mm_MaxViT (maxvit_tiny_rw_224) on the HARD synthetic benchmark
   (the non-saturated quality fixture from scripts/quality_run.py);
2. evaluate at 224 (the trained operating point);
3. retarget the run's variables to each target resolution with
   ``interop.maxvit_convert.retarget_maxvit_variables`` (rel-pos bias
   tables bilinearly resampled, everything else unchanged) and re-evaluate
   zero-shot — ROC-AUC, balanced accuracy, and score agreement vs 224;
4. optionally fine-tune briefly at the headline target (160) from the
   retargeted weights and re-evaluate (the recommended deployment recipe
   when zero-shot quality is not enough).

Results land in docs/quality_run_hard/maxvit_retarget.json.  The serving
speedups quoted alongside come from the on-chip resolution study in
docs/perf_sweep.json (224->160 = 1.58x).

Run:  python scripts/maxvit_retarget_study.py [--objects 1500]
      [--epochs 12] [--finetune-epochs 3] [--out docs/quality_run_hard]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_run import META_COLS, make_dataset  # noqa: E402

BASE_CFG = {
    "model_name": "mm_MaxViT",
    "model_kind": "maxvit_tiny_rw_224.sw_in1k",
    "meta_fc1_neurons": 128, "meta_fc2_neurons": 128, "meta_dropout": 0.25,
    "comb_fc1_neurons": 64, "comb_fc2_neurons": 32, "comb_dropout": 0.2,
    "train_data_version": "vq", "metadata_cols": META_COLS,
    "learning_rate": 3e-4, "beta_1": 0.9, "beta_2": 0.999,
    "batch_size": 256, "warmup_epochs": 1, "random_seed": 2,
    "use_test_split": True, "device_data": True,
    "device_data_dtype": "bfloat16", "compute_dtype": "bfloat16",
    "data_aug_h_flip": True, "data_aug_v_flip": True, "data_aug_rot": True,
}


def kind_at(res: int) -> str:
    return f"maxvit_tiny_rw_{res}.sw_in1k"


def eval_at(config, variables, datasets, ref_scores=None):
    """ROC-AUC / bal-acc on val+test, plus mean |score delta| vs the
    224-native scores when given (the behavior-shift measure that matters
    when swapping a production model's operating point)."""
    from btsbot_tpu import build_model
    from btsbot_tpu.engine.eval import predict_dataset
    from btsbot_tpu.metrics.classification import confusion_counts, roc_auc

    model = build_model(config)
    out = {}
    for split, ds in datasets.items():
        t0 = time.time()
        _, scores = predict_dataset(model, config, variables["params"],
                                    variables.get("batch_stats", {}), ds)
        tp, fp, tn, fn = confusion_counts(ds.labels, scores > 0.5)
        bal_acc = 0.5 * (tp / max(tp + fn, 1) + tn / max(tn + fp, 1))
        out[split] = {
            "roc_auc": round(roc_auc(ds.labels, scores), 4),
            "bal_acc": round(float(bal_acc), 4),
            "eval_s": round(time.time() - t0, 1),
        }
        if ref_scores is not None and split in ref_scores:
            out[split]["mean_abs_score_delta_vs_native"] = round(
                float(np.mean(np.abs(scores - ref_scores[split]))), 4)
        out[split]["scores"] = scores
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/quality_run_hard")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--objects", type=int, default=1500)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--finetune-epochs", type=int, default=3)
    p.add_argument("--targets", default="192,160,128")
    p.add_argument("--train-res", type=int, default=224,
                   help="source training resolution (CPU smoke runs train "
                        "smaller)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--reuse-run", default=None, metavar="DIR",
                   help="skip training: load the trained 224 variables from "
                        "this run dir's best/ checkpoint")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from btsbot_tpu import normalize_config
    from btsbot_tpu.engine.train import run_training
    from btsbot_tpu.interop.maxvit_convert import retarget_maxvit_variables

    os.makedirs(args.out, exist_ok=True)
    print(f"device: {jax.devices()[0]}", flush=True)

    t0 = time.time()
    train_ds = make_dataset(args.objects, (4, 12), seed=0, hard=True)
    val_ds = make_dataset(args.objects // 8, (4, 12), seed=1, hard=True)
    test_ds = make_dataset(args.objects // 8, (4, 12), seed=2, hard=True)
    datasets = {"val": val_ds, "test": test_ds}
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val / "
          f"{len(test_ds)} test alerts ({time.time() - t0:.0f}s)", flush=True)

    src_res = args.train_res
    cfg_src = normalize_config({**BASE_CFG, "model_kind": kind_at(src_res),
                                "batch_size": args.batch_size,
                                "epochs": args.epochs,
                                "patience": args.patience})
    summary = {"benchmark": "hard", "device": str(jax.devices()[0]),
               "train_alerts": len(train_ds), "train_res": src_res}
    if args.reuse_run:
        from btsbot_tpu.engine.checkpoint import load_model_variables
        vars_src = load_model_variables(os.path.join(args.reuse_run, "best"))
        vars_src.setdefault("batch_stats", {})
        summary["reused_run"] = args.reuse_run
    else:
        from btsbot_tpu.engine.checkpoint import load_model_variables
        t0 = time.time()
        result = run_training(
            cfg_src, run_name=f"maxvit{src_res}_retarget_src",
            out_root=args.out, train_ds=train_ds,
            val_ds=val_ds, test_ds=test_ds, make_figure=False,
            log=lambda m: print(m, flush=True))
        # evaluate/retarget the BEST checkpoint (same model --reuse-run
        # loads), not the loop-exit state that may be patience epochs stale
        vars_src = load_model_variables(
            os.path.join(result["model_dir"], "best"))
        vars_src.setdefault("batch_stats", {})
        summary["epochs_ran"] = len(result["history"]["val_loss"])
        summary["train_wall_s"] = round(time.time() - t0, 1)

    base = eval_at(cfg_src, vars_src, datasets)
    ref_scores = {s: d.pop("scores") for s, d in base.items()}
    summary[f"native_{src_res}"] = base
    print(f"{src_res} native: {json.dumps(base)}", flush=True)
    all_scores = {f"native_{src_res}_{s}": v for s, v in ref_scores.items()}
    all_scores.update({f"labels_{s}": d.labels for s, d in datasets.items()})

    targets = [int(r) for r in args.targets.split(",") if r]
    for res in targets:
        cfg = normalize_config({**BASE_CFG, "model_kind": kind_at(res),
                                "batch_size": args.batch_size,
                                "epochs": args.epochs,
                                "patience": args.patience})
        vars_r = retarget_maxvit_variables(vars_src, kind_at(res))
        block = eval_at(cfg, vars_r, datasets, ref_scores)
        for s, d in block.items():
            all_scores[f"retarget_{res}_{s}"] = d.pop("scores")
        summary[f"retarget_{res}_zero_shot"] = block
        print(f"retarget {res} zero-shot: {json.dumps(block)}", flush=True)

    if args.finetune_epochs > 0 and targets:
        res = 160 if 160 in targets else targets[0]
        cfg = normalize_config({**BASE_CFG, "model_kind": kind_at(res),
                                "batch_size": args.batch_size,
                                "epochs": args.finetune_epochs,
                                "patience": args.finetune_epochs,
                                "learning_rate": 5e-5, "warmup_epochs": 0})
        vars_r = retarget_maxvit_variables(vars_src, kind_at(res))
        t0 = time.time()
        ft = run_training(cfg, run_name=f"maxvit{res}_retarget_ft",
                          out_root=args.out, train_ds=train_ds,
                          val_ds=val_ds, test_ds=test_ds, make_figure=False,
                          initial_variables=vars_r,
                          log=lambda m: print(m, flush=True))
        vars_ft = {"params": jax.device_get(ft["state"].params),
                   "batch_stats": jax.device_get(ft["state"].batch_stats)}
        block = eval_at(cfg, vars_ft, datasets, ref_scores)
        for s, d in block.items():
            all_scores[f"finetuned_{res}_{s}"] = d.pop("scores")
        block["finetune_wall_s"] = round(time.time() - t0, 1)
        summary[f"retarget_{res}_finetuned"] = block
        print(f"retarget {res} finetuned: {json.dumps(block)}", flush=True)

    np.savez_compressed(os.path.join(args.out, "maxvit_retarget_scores.npz"),
                        **{k: np.asarray(v) for k, v in all_scores.items()})
    out_path = os.path.join(args.out, "maxvit_retarget.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out_path}", flush=True)
    print("MAXVIT_RETARGET_DONE", flush=True)


if __name__ == "__main__":
    main()
