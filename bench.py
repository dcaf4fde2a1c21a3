"""Throughput benchmark: multi-modal ConvNeXt-pico alert scoring on one chip.

Headline metric per BASELINE.md: alerts/sec/chip for multi-modal ConvNeXt
inference (63×63×3 triplets + 25 metadata features → BTS score), target
≥50,000.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "alerts/s/chip", "vs_baseline": N}

Methodology: bf16 compute / f32 params, data pre-staged on device (matching
the reference's convention of benchmarking model throughput on loaded
training .npy arrays, not disk IO), best batch size from a small sweep.
The per-dispatch host↔device round trip through the remote-TPU relay is tens
of ms, so iterations are chained *inside* one jitted lax.scan (each step's
input is perturbed by the previous step's output so XLA cannot hoist or CSE
the loop body) and timing is fenced by a host readback of the result.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_ALERTS_PER_SEC = 50_000.0


def build_scorer(dtype=jnp.bfloat16, iters: int = 50):
    from __graft_entry__ import FLAGSHIP_CONFIG
    from btsbot_tpu import init_model, normalize_config

    config = normalize_config(FLAGSHIP_CONFIG)
    model, variables = init_model(config, rng=0, dtype=dtype)

    @jax.jit
    def score_many(variables, images, metadata):
        def body(carry, _):
            imgs = images + carry  # data dependence defeats loop hoisting
            logits = model.apply(variables, image_input=imgs,
                                 metadata_input=metadata, train=False)
            scores = jax.nn.sigmoid(
                logits.reshape(-1).astype(jnp.float32))
            carry = (jnp.mean(scores) * 1e-20).astype(images.dtype)
            return carry, jnp.mean(scores)

        _, means = jax.lax.scan(body, jnp.zeros((), images.dtype), None,
                                length=iters)
        return jnp.mean(means)

    return score_many, variables


def bench_batch(score_many, variables, batch: int, dtype,
                iters: int = 50) -> float:
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, 63, 63, 3)), dtype))
    metadata = jax.device_put(jnp.asarray(rng.normal(size=(batch, 25)), dtype))

    float(score_many(variables, images, metadata))  # warmup + compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = float(score_many(variables, images, metadata))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(out)
    return batch * iters / dt


def main():
    import sys
    import traceback

    dtype = jnp.bfloat16
    iters = 50
    score, variables = build_scorer(dtype, iters=iters)
    best = 0.0
    best_batch = 0
    errors = []
    # 3072 is the measured sweet spot on v5e (~15% over the 2^n sizes —
    # better XLA tiling divisibility at these stage shapes); the 2^n sizes
    # stay in the sweep as robustness fallbacks on other topologies.
    for batch in (2048, 3072, 4096, 8192):
        try:
            rate = bench_batch(score, variables, batch, dtype, iters=iters)
        except Exception as e:  # noqa: BLE001 — report best surviving batch
            errors.append(f"batch {batch}: {e}")
            continue
        if rate > best:
            best, best_batch = rate, batch
    if best == 0.0:
        traceback.print_exc()
        print(json.dumps({"metric": "mm_convnext_pico_multimodal_inference_"
                                    "throughput",
                          "value": 0, "unit": "alerts/s/chip",
                          "vs_baseline": 0, "errors": errors}))
        sys.exit(1)
    print(json.dumps({
        "metric": "mm_convnext_pico_multimodal_inference_throughput",
        "value": round(best, 1),
        "unit": "alerts/s/chip",
        "vs_baseline": round(best / BASELINE_ALERTS_PER_SEC, 3),
        "batch_size": best_batch,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
