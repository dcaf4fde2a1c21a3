"""XLA flag sweep + roofline analysis for the headline serving graph.

Round-1/2 kernel studies (ops/pallas_convnext.py, ops/pallas_mlp.py,
ops/quantized.py) established that XLA's native lowering beats hand
kernels at BTSbot shapes; the remaining levers are XLA's own fusion
knobs.  This script (a) measures the headline throughput under candidate
XLA_FLAGS in fresh subprocesses (flags bind at backend init), and
(b) extracts FLOPs + bytes-accessed from the TPU executable's cost
analysis to compute arithmetic intensity vs the v5e ridge point — the
"memory-bound or not" evidence VERDICT.md asked for.

Run: python scripts/perf_sweep.py            # full sweep (TPU)
     python scripts/perf_sweep.py --roofline # cost analysis only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from __graft_entry__ import FLAGSHIP_CONFIG
from btsbot_tpu import init_model, normalize_config

batch, iters = 3072, 50
config = normalize_config(FLAGSHIP_CONFIG)
model, variables = init_model(config, rng=0, dtype=jnp.bfloat16)

@jax.jit
def score_many(variables, images, metadata):
    def body(carry, _):
        imgs = images + carry
        logits = model.apply(variables, image_input=imgs,
                             metadata_input=metadata, train=False)
        scores = jax.nn.sigmoid(logits.reshape(-1).astype(jnp.float32))
        return (jnp.mean(scores) * 1e-20).astype(images.dtype), jnp.mean(scores)
    _, means = jax.lax.scan(body, jnp.zeros((), images.dtype), None,
                            length=iters)
    return jnp.mean(means)

rng = np.random.default_rng(0)
images = jax.device_put(jnp.asarray(rng.normal(size=(batch, 63, 63, 3)),
                                    jnp.bfloat16))
metadata = jax.device_put(jnp.asarray(rng.normal(size=(batch, 25)),
                                      jnp.bfloat16))
float(score_many(variables, images, metadata))
t0 = time.perf_counter()
for _ in range(3):
    out = float(score_many(variables, images, metadata))
dt = (time.perf_counter() - t0) / 3
print("RESULT " + json.dumps({"alerts_per_s": batch * iters / dt}))
"""

#: candidate flag sets (each runs in a fresh process; "" = baseline)
FLAG_SETS = {
    "baseline": "",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "aggressive_broadcast_priority": "--xla_tpu_enable_aggressive_broadcast_priority_update=true",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
}


def run_sweep() -> dict:
    results = {}
    for name, flags in FLAG_SETS.items():
        env = {**os.environ}
        # the baseline child must not inherit an ambient LIBTPU_INIT_ARGS
        # (e.g. the adopted scoped-VMEM flag) or the sweep compares the
        # candidate flags against themselves
        env.pop("LIBTPU_INIT_ARGS", None)
        if flags:
            env["LIBTPU_INIT_ARGS"] = flags
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": REPO}],
                env=env, capture_output=True, text=True, timeout=600)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT ")]
            if line:
                results[name] = json.loads(line[-1][7:])["alerts_per_s"]
            else:
                results[name] = f"no result: {out.stdout[-200:]} " \
                                f"{out.stderr[-200:]}"
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(f"{name}: {results[name]}", flush=True)
    return results


def roofline() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import FLAGSHIP_CONFIG
    from btsbot_tpu import init_model, normalize_config

    batch = 3072
    config = normalize_config(FLAGSHIP_CONFIG)
    model, variables = init_model(config, rng=0, dtype=jnp.bfloat16)

    def fwd(variables, images, metadata):
        return model.apply(variables, image_input=images,
                           metadata_input=metadata, train=False)

    lowered = jax.jit(fwd).lower(
        variables, jnp.zeros((batch, 63, 63, 3), jnp.bfloat16),
        jnp.zeros((batch, 25), jnp.bfloat16))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    intensity = flops / byts if byts else float("nan")
    # v5e: 197 TFLOP/s bf16, 819 GB/s HBM → ridge at ~240 FLOP/byte
    ridge = 197e12 / 819e9
    report = {
        "batch": batch,
        "flops_per_alert": flops / batch,
        "bytes_per_alert": byts / batch,
        "arithmetic_intensity_flops_per_byte": round(intensity, 1),
        "v5e_ridge_point_flops_per_byte": round(ridge, 1),
        "memory_bound": intensity < ridge,
        "hbm_time_ms_per_batch": round(byts / 819e9 * 1e3, 3),
        "mxu_time_ms_per_batch": round(flops / 197e12 * 1e3, 3),
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--roofline", action="store_true")
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()
    out = {}
    if args.roofline or not args.sweep:
        out["roofline"] = roofline()
    if args.sweep or not args.roofline:
        out["sweep"] = run_sweep()
    # merge: perf_sweep.json also records standalone studies (attribution,
    # mlp-ratio, train-step) that a flag-sweep rerun must not clobber
    path = os.path.join(REPO, "docs", "perf_sweep.json")
    merged = {}
    if os.path.isfile(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print("PERF_SWEEP_DONE")
