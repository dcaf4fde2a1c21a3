"""Validation CLI: ``python -m btsbot_tpu.cli.val <model_dir> [options]``.

Replaces the reference's standalone validation entry (val.py:685-737):
re-evaluates a trained model dir on a split and writes perf.json.  With
``--run-id`` it re-validates a LOGGED run instead — pulling config,
run name, and training history from the experiment-tracking API and
resolving the local run dir from the reference's naming convention —
the exact workflow of the reference's ``__main__`` block.
"""

from __future__ import annotations

import argparse
import json
import os

from ..core.config import normalize_config
from ..data.dataset import load_split
from ..engine.checkpoint import load_model_variables
from ..engine.eval import evaluate
from ..metrics.diagnostics import diagnostic_summary
from ..metrics.report import load_report_config
from ..models.factory import init_model


def resolve_logged_run(run_id: str, api=None,
                       project: str = "BTSbot/runs/",
                       out_root: str = "models",
                       device_suffix: str = "tpu"):
    """Pull (config, run_name, history, model_dir) for a logged run
    (reference val.py:691-712).

    ``api`` is injectable (needs ``.run(path)`` returning an object with
    ``.config``/``.name``/``.history()``) so re-validation is testable
    offline; the default uses ``wandb.Api()`` when wandb is installed.
    The run dir follows the training convention
    ``{out_root}/{model_name}_{version}_N{N_max}_{suffix}/{run_name}``
    (engine/train.py run_model_name; reference val.py:703-704).
    """
    if api is None:
        import wandb  # deployment-image dependency, injectable in tests

        api = wandb.Api()
    run = api.run(project + run_id)
    config = normalize_config(dict(run.config))
    history = run.history()
    run_model_name = (f"{config['model_name']}_"
                      f"{config['train_data_version']}"
                      f"_N{config.get('N_max', 100)}_{device_suffix}")
    model_dir = os.path.join(out_root, run_model_name, run.name)
    return config, run.name, history, model_dir


def _history_run_data(history, run_name: str) -> dict:
    """Training-curve series for the diagnostics figure (reference
    val.py:714-723), tolerant of either DataFrame or dict-of-lists
    histories and of the reference's or our column naming."""
    def col(*names):
        for n in names:
            try:
                series = history[n]
            except (KeyError, IndexError, TypeError):
                continue
            return [float(v) for v in list(series)]
        return []

    return {
        "run_name": run_name,
        "loss": col("train_loss", "loss"),
        "accuracy": col("train_accuracy", "accuracy"),
        "val_loss": col("val_loss"),
        "val_accuracy": col("val_accuracy"),
    }


def main(argv=None, api=None):
    """api: injectable tracking-API client for --run-id (tests pass a
    fake; production omits it and wandb.Api() is used)."""
    p = argparse.ArgumentParser(description="Evaluate a trained model dir")
    p.add_argument("model_dir", nargs="?", default=None,
                   help="Dir containing report.json + best/ checkpoint "
                        "(omit with --run-id)")
    p.add_argument("--run-id", default=None,
                   help="Re-validate a logged run by id: config/history "
                        "come from the tracking API, the run dir from the "
                        "training naming convention (val.py:685-737)")
    p.add_argument("--project", default="BTSbot/runs/",
                   help="Tracking-API project prefix for --run-id")
    p.add_argument("--out-root", default="models",
                   help="Training output root for --run-id dir resolution")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--split", default="val")
    p.add_argument("--figure", action="store_true")
    p.add_argument("--calibrate", action="store_true",
                   help="Fit temperature scaling on this split and report "
                        "NLL/ECE before/after (metrics/calibration.py)")
    args = p.parse_args(argv)

    run_data = None
    if args.run_id is not None:
        config, run_name, history, model_dir = resolve_logged_run(
            args.run_id, api=api, project=args.project,
            out_root=args.out_root)
        args.model_dir = model_dir
        run_data = _history_run_data(history, run_name)
        print(f"re-validating logged run {args.run_id} ({run_name}) "
              f"from {model_dir}")
    elif args.model_dir is None:
        p.error("need a model_dir or --run-id")
    else:
        config = normalize_config(load_report_config(args.model_dir))
    model, template = init_model(config, rng=0)
    variables = load_model_variables(
        os.path.join(args.model_dir, "best"),
        template={"params": template["params"],
                  "batch_stats": template.get("batch_stats", {})})

    ds = load_split(config, args.split, args.data_dir)
    loss, acc, raw_preds, labels = evaluate(
        model, config, variables["params"], variables.get("batch_stats", {}),
        ds, pos_weight=ds.pos_weight)
    print(f"{args.split} loss {loss:.5f}  acc {acc:.5f}")

    summary = diagnostic_summary(
        ds.candidates, raw_preds, labels,
        run_data=run_data,
        make_figure=args.figure,
        fig_path=os.path.join(args.model_dir,
                              f"{args.split}_diagnostics.pdf"))
    summary.pop("fig", None)
    if args.calibrate:
        from ..metrics.calibration import calibration_report
        summary["calibration"] = calibration_report(raw_preds, labels)
        print(f"calibration: {summary['calibration']}")
    perf_path = os.path.join(args.model_dir, "perf.json")
    with open(perf_path, "w") as f:
        json.dump(summary, f, indent=4, default=float)
    print(f"Wrote {perf_path}")


if __name__ == "__main__":
    main()
