"""Training CLI: ``python -m btsbot_tpu.cli.train <config.json> [options]``.

Replaces the reference's ``python train.py <config.json>`` entry
(train.py:569-577).  The wandb-sweep entry is covered by ``--run-name`` plus
external sweep drivers; experiment logging hooks are available through
``run_training``'s epoch_callback.
"""

from __future__ import annotations

import argparse

from ..core.config import load_config
from ..engine.train import run_training
from ..parallel.mesh import make_mesh


def main(argv=None):
    p = argparse.ArgumentParser(description="Train a btsbot-tpu model")
    p.add_argument("config", help="Path to flat-JSON train config")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--out-root", default="models")
    p.add_argument("--run-name", default="run")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in the model dir")
    p.add_argument("--no-figure", action="store_true")
    p.add_argument("--mesh", default=None,
                   help="Mesh spec 'DATAxMODEL' (e.g. 4x2); default: all "
                        "devices on the data axis")
    args = p.parse_args(argv)

    config = load_config(args.config)
    mesh = None
    import jax
    if args.mesh:
        data, model = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(data=data, model=model)
    elif len(jax.devices()) > 1:
        mesh = make_mesh()

    run_training(
        config,
        data_dir=args.data_dir,
        out_root=args.out_root,
        run_name=args.run_name,
        mesh=mesh,
        resume=args.resume,
        make_figure=not args.no_figure,
    )


if __name__ == "__main__":
    main()
