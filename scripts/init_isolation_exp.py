"""Isolate the mm_ConvNeXt trainer-parity gap: is it weight init?

Trains OUR engine on the trainer-parity fixture three ways:
  A. flax-default init (control; should reproduce the ~0.967 CPU numbers)
  B. torch-default init imported from the reference model itself
     (torch.manual_seed(seed) -> architectures.mm_ConvNeXt -> converter)
  C. the SHIPPED default init (models/init.py torch_default_reinit, i.e.
     init_scheme="torch" with no transplant) — validates that the
     package's own redraw, not just the exact reference transplant,
     recovers reference trainer quality on the flagship
Runs on the TPU for speed; prints one JSON line per leg.
Committed artifact: docs/init_experiment.json (r5; led to models/init.py).
"""
import json
import os
import sys
import time

sys.path[0:0] = ["/root/repo", "/root/repo/scripts", "/root/repo/tests"]

import numpy as np  # noqa: E402
import torch  # noqa: E402

from trainer_parity import (ARCHS, COMMON_HP, _mirror_create_model,  # noqa: E402
                            reference_trainer)
from quality_run import META_COLS, make_dataset  # noqa: E402

from btsbot_tpu import normalize_config, torch_state_dict_to_variables  # noqa: E402
from btsbot_tpu.engine.train import run_training  # noqa: E402

OUT = os.environ.get("INIT_EXP_OUT", "/tmp/torchinit_exp.json")


def main():
    t0 = time.time()
    splits = {
        "train": make_dataset(400, (4, 12), seed=0, hard=True),
        "val": make_dataset(100, (4, 12), seed=1, hard=True),
    }
    print(f"fixture ready ({time.time()-t0:.0f}s)", flush=True)

    results = {}
    if os.path.isfile(OUT):
        results = json.load(open(OUT))

    def record(key, summ, wall):
        results[key] = {"roc_auc": summ["roc_auc"], "bal_acc": summ["bal_acc"],
                        "wall_s": round(wall, 1)}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(key, json.dumps(results[key]), flush=True)

    for seed in (0, 1):
        cfg = normalize_config({
            **COMMON_HP, **ARCHS["mm_ConvNeXt"],
            "epochs": 15, "random_seed": seed, "metadata_cols": META_COLS,
        })

        key = f"torch_init_s{seed}"
        if key not in results:
            torch.manual_seed(seed)
            factory = _mirror_create_model()
            with reference_trainer(create_model=factory):
                import architectures
                oracle = architectures.mm_ConvNeXt(dict(cfg))
            sd = {k: v.numpy() for k, v in oracle.state_dict().items()
                  if "num_batches_tracked" not in k}
            variables = torch_state_dict_to_variables(cfg, sd)
            t = time.time()
            r = run_training(cfg, run_name=key, out_root="/tmp/torchinit_runs",
                             train_ds=splits["train"], val_ds=splits["val"],
                             make_figure=False, initial_variables=variables,
                             log=lambda m: None)
            record(key, r["summaries"]["val"], time.time() - t)

        key = f"shipped_init_s{seed}"
        if key not in results:
            assert cfg["init_scheme"] == "torch"  # the shipped default
            t = time.time()
            r = run_training(cfg, run_name=key, out_root="/tmp/torchinit_runs",
                             train_ds=splits["train"], val_ds=splits["val"],
                             make_figure=False, log=lambda m: None)
            record(key, r["summaries"]["val"], time.time() - t)

        key = f"flax_init_s{seed}"
        if key not in results:
            t = time.time()
            r = run_training(cfg, run_name=key, out_root="/tmp/torchinit_runs",
                             train_ds=splits["train"], val_ds=splits["val"],
                             make_figure=False, log=lambda m: None)
            record(key, r["summaries"]["val"], time.time() - t)

    print("TORCHINIT_EXP_DONE", flush=True)


if __name__ == "__main__":
    main()
