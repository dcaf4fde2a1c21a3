"""A/B the ``dwconv_dense`` lowering inside the FULL training step.

The depthwise conv's backward pass is also VPU-bound (VERDICT r4 #4;
reference hot loop /root/reference/btsbot/train.py:496-547), so the serving
rejection (scripts/dwconv_dense_ab.py: 0.60x) does not automatically decide
the training graph — the backward's data-gradient and weight-gradient convs
have different shapes and could route differently.  This measures
bench.py's own ``bench_train_step`` conditions (scan-carried TrainState,
bf16 mixed precision, batch 4096) with the flag on/off.

Run: python scripts/dwconv_dense_train_ab.py  (TPU; ~6 min, 2 train compiles)
Results: docs/dwconv_dense_experiment.json (key "train_ab") + stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets LIBTPU scoped-vmem flag on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench_train(dwconv_dense, batch=4096, iters=10) -> float:
    from __graft_entry__ import FLAGSHIP_CONFIG

    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.engine.state import create_train_state, make_optimizer
    from btsbot_tpu.engine.steps import make_train_step

    cfg = normalize_config({**FLAGSHIP_CONFIG, "compute_dtype": "bfloat16",
                            "dwconv_dense": dwconv_dense})
    model, variables = init_model(cfg, rng=0, dtype=jnp.bfloat16)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, variables, tx, seed=0)
    step = make_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(batch, 63, 63, 3)), jnp.bfloat16))
    metadata = jax.device_put(
        jnp.asarray(rng.normal(size=(batch, 25)), jnp.bfloat16))
    labels = jax.device_put(
        jnp.asarray(rng.random(batch) < 0.5, jnp.float32))

    @jax.jit
    def epoch(state, images, metadata, labels):
        def body(st, _):
            st, m = step(st, images, metadata, labels, jnp.float32(1.17))
            return st, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=iters)
        return jnp.mean(losses)

    assert np.isfinite(float(epoch(state, images, metadata, labels)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(epoch(state, images, metadata, labels))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    results = {}
    for label, flag in (("dwconv", False), ("dwconv_dense", True)):
        rate = bench_train(flag)
        results[label] = round(rate, 1)
        print(f"train {label}: {rate:,.0f} alerts/s", flush=True)
    results["speedup"] = round(results["dwconv_dense"] / results["dwconv"], 4)
    print(f"train speedup: {results['speedup']}x", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "dwconv_dense_experiment.json")
    with open(out) as f:
        data = json.load(f)
    data["train_ab"] = results
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
