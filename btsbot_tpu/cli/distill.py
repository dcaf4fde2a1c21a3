"""Distillation CLI: ``python -m btsbot_tpu.cli.distill <teacher_dir> [opts]``.

One-command route from a trained or converted mm_ConvNeXt checkpoint
directory (HF snapshot with pytorch_model.bin, or a btsbot_tpu training run
dir) to the faster ``inceptionnext_<size>`` serving variant.  No reference
counterpart (the reference has no student/compression path); see
engine/distill.py for the mechanism and docs/CONFIG.md for the
``distill_*`` config keys.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Distill a trained model into a faster serving variant")
    p.add_argument("teacher_dir",
                   help="Teacher model dir (HF snapshot or training run)")
    p.add_argument("--student-kind", default="inceptionnext_pico.r2",
                   help="Student model_kind (default: inceptionnext_pico.r2"
                        " — the measured fast-serving variant, 1.78x "
                        "ConvNeXt-pico at equal quality)")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--out-root", default="models")
    p.add_argument("--run-name", default="distill")
    p.add_argument("--epochs", type=int, default=None,
                   help="Override the teacher config's epoch count")
    p.add_argument("--alpha", type=float, default=0.5,
                   help="Weight on the hard-label BCE term (rest goes to KD)")
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--no-figure", action="store_true")
    args = p.parse_args(argv)

    from ..engine.distill import (
        distill_to_student,
        load_teacher,
        student_config_from_teacher,
    )

    t_model, t_vars, t_cfg = load_teacher(args.teacher_dir)
    overrides = {"distill_alpha": args.alpha,
                 "distill_temperature": args.temperature}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    student_config = student_config_from_teacher(
        t_cfg, args.student_kind, **overrides)

    result = distill_to_student(
        teacher=(t_model, t_vars),
        student_config=student_config,
        data_dir=args.data_dir,
        out_root=args.out_root,
        run_name=args.run_name,
        make_figure=not args.no_figure,
    )
    print(f"student model dir: {result['model_dir']}")


if __name__ == "__main__":
    main()
