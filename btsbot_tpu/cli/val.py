"""Validation CLI: ``python -m btsbot_tpu.cli.val <model_dir> [options]``.

Replaces the reference's standalone validation entry (val.py:685-737):
re-evaluates a trained model dir on a split and writes perf.json.
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


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a trained model dir")
    p.add_argument("model_dir",
                   help="Dir containing report.json + best/ checkpoint")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--split", default="val")
    p.add_argument("--figure", action="store_true")
    p.add_argument("--calibrate", action="store_true",
                   help="Fit temperature scaling on this split and report "
                        "NLL/ECE before/after (metrics/calibration.py)")
    args = p.parse_args(argv)

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
