"""On-chip cost attribution for the inceptionnext serving graph.

Times the full model against ablated variants (identity token mixer /
1x-MLP blocks) at batch 4096 bf16; the deltas attribute the measured
ms/batch between the mixer, the MLP expansion width, and everything else.
This study motivated the '.r<k>' MLP-width knob (models/convnext.py):
at r4 the extra 3x expansion width was 34% of serving time vs 18% for the
mixer.  Results recorded in docs/perf_sweep.json
("inceptionnext_pico_study".attribution_ms_batch4096).

Run:  python scripts/attribution_study.py [--kind inceptionnext_pico]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("LIBTPU_INIT_ARGS",
                      "--xla_tpu_scoped_vmem_limit_kib=32768")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", default="inceptionnext_pico")
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args()

    import flax.linen as nn
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_CONFIG
    from bench import bench_batch, build_scorer
    import btsbot_tpu.models.convnext as cnx

    out = {"kind": args.kind, "batch": args.batch}

    def measure(tag):
        score, variables = build_scorer(
            jnp.bfloat16, iters=50,
            config=dict(FLAGSHIP_CONFIG, model_kind=args.kind))
        rate = bench_batch(score, variables, args.batch, jnp.bfloat16,
                           iters=50)
        out[tag] = {"alerts_per_s": round(rate, 1),
                    "ms_per_batch": round(args.batch / rate * 1e3, 3)}

    measure("full")

    class IdentityMixer(cnx.InceptionMixer):
        @nn.compact
        def __call__(self, x):
            return x

    class SlimBlock(cnx.ConvNeXtBlock):
        """mixer kept; MLP expansion -> 1x; layer-scale kept."""

        @nn.compact
        def __call__(self, x):
            shortcut = x
            x = cnx.InceptionMixer(self.dim, dtype=self.dtype,
                                   name="mixer")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc1")(x)
            x = cnx.gelu_exact(x)
            x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(x)
            gamma = self.param("gamma", nn.initializers.constant(
                self.ls_init_value), (self.dim,))
            return shortcut + x * gamma.astype(x.dtype)

    orig_mixer = cnx.InceptionMixer
    cnx.InceptionMixer = IdentityMixer
    try:
        measure("identity_mixer")
    finally:
        cnx.InceptionMixer = orig_mixer

    orig_block = cnx.ConvNeXtBlock
    cnx.ConvNeXtBlock = SlimBlock
    try:
        measure("slim_mlp_1x")
    finally:
        cnx.ConvNeXtBlock = orig_block

    full = out["full"]["ms_per_batch"]
    mixer = full - out["identity_mixer"]["ms_per_batch"]
    mlp_extra = full - out["slim_mlp_1x"]["ms_per_batch"]
    out["attribution_ms"] = {
        "token_mixer": round(mixer, 3),
        "mlp_expansion_above_1x": round(mlp_extra, 3),
        "rest": round(full - mixer - mlp_extra, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
