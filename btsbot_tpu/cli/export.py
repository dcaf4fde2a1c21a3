"""Deployment-export CLI: ``python -m btsbot_tpu.cli.export <model_dir>``.

The replacement for the reference's ``python -m btsbot.to_onnx <model_dir>
[--output] [--verify]`` (to_onnx.py:146-167), with three artifact formats:

* ``onnx`` (default) — a real .onnx file emitted directly (no onnx/torch
  deps; interop/onnx_export.py), dynamic batch axis, inputs
  ``image``/``metadata``, output ``logits`` — the reference's broker
  contract;
* ``saved_model`` — TF SavedModel via jax2tf (interop/savedmodel.py) for
  TF-Serving deployments;
* ``torch`` — reference-named ``pytorch_model.bin`` loadable by the
  original btsbot package (interop/export.py).

Each format is verified against the native JAX f32 graph at the reference's
tolerance (rtol 1e-4 / atol 1e-5, to_onnx.py:135-137) on synthetic inputs,
and the verification report is printed and written next to the artifact.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _verification_inputs(config, n: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    triplets = metadata = None
    if config.need_triplets:
        s = int(config.get("image_size", 63))
        triplets = rng.normal(size=(n, s, s, 3)).astype(np.float32)
    if config.need_metadata:
        metadata = rng.normal(
            size=(n, len(config["metadata_cols"]))).astype(np.float32)
    return triplets, metadata


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a trained model dir as a deployment artifact")
    p.add_argument("model_dir",
                   help="Dir containing report.json + best/ checkpoint")
    p.add_argument("--output", default=None,
                   help="Artifact path (default <model_dir>/model.onnx or "
                        "<model_dir>/saved_model/)")
    p.add_argument("--format", default="onnx",
                   choices=["onnx", "saved_model", "torch"])
    p.add_argument("--no-verify", action="store_true",
                   help="Skip the cross-runtime verification pass")
    p.add_argument("--retarget-resolution", type=int, default=None,
                   metavar="RES",
                   help="MaxViT only: export the artifact at this native "
                        "resolution instead of the trained one (rel-pos "
                        "bias tables resampled; re-validate quality first "
                        "— scripts/maxvit_retarget_study.py)")
    args = p.parse_args(argv)

    from ..core.config import normalize_config
    from ..engine.checkpoint import load_model_variables
    from ..metrics.report import load_report_config
    from ..models.factory import init_model

    config = normalize_config(load_report_config(args.model_dir))
    _, template = init_model(config, rng=0)
    variables = load_model_variables(
        os.path.join(args.model_dir, "best"),
        template={"params": template["params"],
                  "batch_stats": template.get("batch_stats", {})})

    if args.retarget_resolution is not None:
        from ..interop.maxvit_convert import (retarget_maxvit_variables,
                                              retarget_model_kind)
        kind = retarget_model_kind(config.get("model_kind", ""),
                                   args.retarget_resolution)
        variables = retarget_maxvit_variables(variables, kind)
        config = normalize_config({**config, "model_kind": kind})
        print(f"retargeted to {kind}")

    triplets, metadata = _verification_inputs(config)
    report = None

    if args.format == "onnx":
        from ..interop.onnx_export import export_onnx, verify_onnx
        out = args.output or os.path.join(args.model_dir, "model.onnx")
        export_onnx(config, variables, out)
        if not args.no_verify:
            report = verify_onnx(
                out, config, variables, triplets, metadata,
                report_path=f"{os.path.splitext(out)[0]}.verification.json")
    elif args.format == "saved_model":
        from ..interop.savedmodel import export_saved_model, verify_saved_model
        out = args.output or os.path.join(args.model_dir, "saved_model")
        export_saved_model(config, variables, out)
        if not args.no_verify:
            report = verify_saved_model(
                out, config, variables, triplets, metadata,
                report_path=os.path.join(out, "verification.json"))
    else:
        from ..interop.export import save_torch_checkpoint
        out = args.output or os.path.join(args.model_dir,
                                          "pytorch_model.bin")
        save_torch_checkpoint(out, config, variables)

    print(f"Exported {args.format} artifact: {out}")
    if report is not None:
        print(json.dumps(report))
        if not report["close"]:
            raise SystemExit(
                f"Verification FAILED: max_diff {report['max_diff']:.3e} "
                f"exceeds rtol {report['rtol']} / atol {report['atol']}")
        print(f"Verified vs JAX f32 graph: max|diff| = "
              f"{report['max_diff']:.3e} (rtol {report['rtol']}, "
              f"atol {report['atol']})")
    return out


if __name__ == "__main__":
    main()
