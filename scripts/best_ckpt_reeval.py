"""Re-evaluate surviving ``best/`` checkpoints on the TEST split (CPU).

Interim evidence for the round-3 stale-TEST-metric caveat
(docs/ROUND_NOTES.md): committed ``summary.json`` TEST columns were measured
on loop-exit weights (up to ``patience`` epochs past the best) before the
best-checkpoint-eval fix landed in engine/train.py:299-308.  The full fix is
an on-chip ``quality_run.py`` re-run, but while the TPU relay is down this
script re-scores the TEST split from the *best* checkpoints that survive on
disk, quantifying exactly how stale each committed number is.

Only run dirs that still contain ``best/`` can be re-evaluated (mm_cnn /
mm_ConvNeXt checkpoints were cleaned before the dirs were gitignored); the
rest wait for the on-chip re-run.  Matches the reference's own contract of
evaluating the reloaded best model (/root/reference/btsbot/train.py:370-375).

Run:  python scripts/best_ckpt_reeval.py [--out docs/quality_run_hard]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_run import make_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/quality_run_hard")
    p.add_argument("--objects", type=int, default=2500,
                   help="must match the quality_run that produced the dirs")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from btsbot_tpu.core.config import normalize_config
    from btsbot_tpu.engine.checkpoint import load_model_checkpoint
    from btsbot_tpu.engine.eval import predict_dataset
    from btsbot_tpu.metrics.diagnostics import diagnostic_summary
    from btsbot_tpu.models.factory import init_model

    # same generator/seed as quality_run.py's test split
    test_ds = make_dataset(args.objects // 8, (4, 12), seed=2, hard=True)
    print(f"test split: {len(test_ds)} alerts", flush=True)

    summary_path = os.path.join(args.out, "summary.json")
    with open(summary_path) as f:
        committed = json.load(f)["models"]

    keys = ("roc_auc", "bal_acc", "bts_acc", "notbts_acc",
            "alert_precision", "alert_recall")
    results = {}
    for name, entry in committed.items():
        model_dir = entry.get("model_dir")
        if not model_dir or not os.path.isdir(
                os.path.join(model_dir, "best")):
            print(f"{name}: no surviving best/ checkpoint — skipped",
                  flush=True)
            continue
        with open(os.path.join(model_dir, "report.json")) as f:
            cfg = normalize_config(json.load(f)["train_config"])
        t0 = time.time()
        # evaluate in the dtype the run trained/evaluated in (engine/train.py
        # passes dtype=compute_dtype; defaulting to f32 here would fold dtype
        # drift into the staleness delta)
        compute_dtype = jnp.dtype(cfg.get("compute_dtype", "float32"))
        model, _ = init_model(cfg, rng=0, dtype=compute_dtype)
        variables = load_model_checkpoint(cfg, model_dir)
        _, scores = predict_dataset(
            model, cfg, variables["params"],
            variables.get("batch_stats", {}), test_ds)
        summary = diagnostic_summary(
            test_ds.candidates, scores, test_ds.labels)
        best = {k: summary.get(k) for k in keys}
        stale = entry.get("test", {})
        results[name] = {
            "best_ckpt_test": best,
            "committed_loop_exit_test": {k: stale.get(k) for k in keys},
            "roc_auc_delta_best_minus_committed":
                (best["roc_auc"] - stale["roc_auc"])
                if best.get("roc_auc") is not None
                and stale.get("roc_auc") is not None else None,
            "eval_wall_s": round(time.time() - t0, 1),
            "note": f"best/ checkpoint re-scored on CPU in "
                    f"{compute_dtype.name} (the run's compute_dtype); "
                    "committed column was loop-exit weights measured "
                    "on-chip",
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    out_path = os.path.join(args.out, "best_ckpt_reeval.json")
    with open(out_path, "w") as f:
        json.dump({"device": "cpu", "models": results}, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
