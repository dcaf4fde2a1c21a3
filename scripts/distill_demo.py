"""On-chip distillation demo: teacher quality transfers to the fast student.

Trains an mm_ConvNeXt-pico teacher on the quality-run benchmark dataset,
then trains two inceptionnext_pico students for HALF the teacher's epochs:
one distilled from the teacher (engine/distill.py), one from scratch.
Records val/test ROC-AUC for all three plus student/teacher score agreement
— the evidence that `distill_to_student` transfers a trained model's
quality into the 1.41×-faster serving variant with a shorter schedule.

Run:  python scripts/distill_demo.py [--out docs/quality_run] [--cpu]
Results land in <out>/distill_demo.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_run import CONFIGS, META_COLS, make_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/quality_run")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--objects", type=int, default=1200)
    p.add_argument("--teacher-epochs", type=int, default=20)
    p.add_argument("--student-epochs", type=int, default=10)
    p.add_argument("--hard", action="store_true",
                   help="hard benchmark: overlapping magnitudes + 10%% "
                        "train-label noise (val labels stay clean) — the "
                        "regime where KD's denoising can show an edge")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from btsbot_tpu import build_model, normalize_config
    from btsbot_tpu.engine.checkpoint import load_model_variables
    from btsbot_tpu.engine.distill import distill_to_student, load_teacher
    from btsbot_tpu.engine.train import run_training

    os.makedirs(args.out, exist_ok=True)
    print(f"device: {jax.devices()[0]}", flush=True)
    suffix = "_hard" if args.hard else ""

    train_ds = make_dataset(args.objects, (4, 12), seed=10, hard=args.hard,
                            label_noise=0.10 if args.hard else 0.0)
    val_ds = make_dataset(args.objects // 8, (4, 12), seed=11, hard=args.hard)
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val"
          f"{' (hard)' if args.hard else ''}", flush=True)

    base = {
        **CONFIGS["mm_ConvNeXt"],
        "train_data_version": "vd", "metadata_cols": META_COLS,
        "learning_rate": 5e-4, "beta_1": 0.9, "beta_2": 0.999,
        "batch_size": 1024, "warmup_epochs": 2, "patience": 50,
        "random_seed": 2, "device_data": True,
        "device_data_dtype": "bfloat16", "compute_dtype": "bfloat16",
        "data_aug_h_flip": True, "data_aug_v_flip": True,
        "data_aug_rot": True,
    }
    results = {}

    def val_auc(model, variables, ds):
        from btsbot_tpu.metrics.classification import roc_auc
        imgs = jnp.asarray(ds.images, jnp.bfloat16)
        meta = jnp.asarray(ds.metadata, jnp.bfloat16)
        scores = []
        for i in range(0, len(ds), 2048):
            s = jax.nn.sigmoid(model.apply(
                variables, image_input=imgs[i:i + 2048],
                metadata_input=meta[i:i + 2048],
                train=False).reshape(-1).astype(jnp.float32))
            scores.append(np.asarray(s))
        scores = np.concatenate(scores)
        return float(roc_auc(ds.labels, scores)), scores

    # /-------- teacher --------/
    t0 = time.time()
    t_cfg = normalize_config({**base, "epochs": args.teacher_epochs})
    t_res = run_training(t_cfg, run_name=f"demo_teacher{suffix}", out_root=args.out,
                         train_ds=train_ds, val_ds=val_ds, make_figure=False,
                         log=lambda m: print(m, flush=True))
    t_model, t_vars, _ = load_teacher(t_res["model_dir"])
    t_auc, t_scores = val_auc(t_model, t_vars, val_ds)
    results["teacher_convnext_pico"] = {
        "epochs": args.teacher_epochs, "val_roc_auc": round(t_auc, 5),
        "wall_s": round(time.time() - t0, 1)}
    print(f"teacher val ROC-AUC: {t_auc:.5f}", flush=True)

    # /-------- students: distilled vs scratch, half the epochs --------/
    for tag, teacher in (("distilled", (t_model, t_vars)), ("scratch", None)):
        t0 = time.time()
        s_cfg = normalize_config({
            **base, "model_kind": "inceptionnext_pico",
            "epochs": args.student_epochs,
            "distill_alpha": 0.5, "distill_temperature": 2.0})
        kwargs = dict(run_name=f"demo_student_{tag}{suffix}", out_root=args.out,
                      train_ds=train_ds, val_ds=val_ds, make_figure=False,
                      log=lambda m: print(m, flush=True))
        if teacher is not None:
            s_res = distill_to_student(teacher=teacher, student_config=s_cfg,
                                       **kwargs)
        else:
            s_res = run_training(s_cfg, **kwargs)
        s_model = build_model(s_cfg, dtype=jnp.bfloat16)
        s_vars = load_model_variables(
            os.path.join(s_res["model_dir"], "best"))
        s_auc, s_scores = val_auc(s_model, s_vars, val_ds)
        results[f"student_inceptionnext_{tag}"] = {
            "epochs": args.student_epochs, "val_roc_auc": round(s_auc, 5),
            "mean_abs_score_diff_vs_teacher": round(
                float(np.mean(np.abs(s_scores - t_scores))), 5),
            "wall_s": round(time.time() - t0, 1)}
        print(f"student[{tag}] val ROC-AUC: {s_auc:.5f}", flush=True)

    results["note"] = ("same data/seed/schedule for both students; the "
                       "distilled one additionally minimizes the KD term "
                       "against the trained teacher (alpha 0.5, T 2.0)")
    fname = "distill_demo_hard.json" if args.hard else "distill_demo.json"
    with open(os.path.join(args.out, fname), "w") as f:
        json.dump({"device": str(jax.devices()[0]), "hard": args.hard,
                   "results": results}, f, indent=1)
    print("DISTILL_DEMO_DONE", flush=True)


if __name__ == "__main__":
    main()
