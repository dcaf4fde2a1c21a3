"""Train-step roofline + attribution sweep (VERDICT r2 weak #2).

Applies the same rigor to the jitted training step that perf_sweep.py
applies to inference: (a) cost-analysis roofline of the FULL train step
(on-device aug + fwd + weighted-BCE bwd + AdamW) so the train MFU claim is
FLOP-honest, (b) an on-chip batch sweep, (c) stage attribution
(fwd-only → +bwd → +optimizer → +aug) from separately compiled variants,
(d) the same step on the TPU-native inceptionnext kind — if the depthwise
conv's backward is the wall (its forward was, pre-InceptionNeXt — see
docs/perf_sweep.json inceptionnext_pico_study), the gap shows here, and
(e) a small XLA flag sweep in fresh subprocesses.

Results merge into docs/perf_sweep.json under "train_step_study_r3".

Run (TPU):  python scripts/train_sweep.py            # everything
            python scripts/train_sweep.py --roofline # cost analysis only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from __graft_entry__ import FLAGSHIP_CONFIG
from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.engine.loss import weighted_bce_with_logits
from btsbot_tpu.engine.state import create_train_state, make_optimizer
from btsbot_tpu.ops.augment import augment_triplets

kind = %(kind)r
batch = %(batch)d
variant = %(variant)r   # full | no_aug | fwd_bwd | fwd
iters = 10

cfg = normalize_config({**FLAGSHIP_CONFIG, "model_kind": kind,
                        "compute_dtype": "bfloat16"})
model, variables = init_model(cfg, rng=0, dtype=jnp.bfloat16)
tx = make_optimizer(cfg, steps_per_epoch=10)
state = create_train_state(cfg, variables, tx, seed=0)

do_aug = variant == "full"

def loss_fn(params, batch_stats, images, metadata, labels, rng):
    vs = {"params": params, "batch_stats": batch_stats}
    out = model.apply(vs, image_input=images, metadata_input=metadata,
                      train=True, mutable=["batch_stats"],
                      rngs={"dropout": rng})
    logits, updates = out
    loss = weighted_bce_with_logits(logits, labels, jnp.float32(1.17))
    return loss, updates.get("batch_stats", {})

def one_step(state, carry, images, metadata, labels):
    # carry-scalar perturbation defeats scan invariant-code motion: in the
    # fwd/fwd_bwd variants the params never change, and without this XLA
    # hoists the whole (dropout-free) backbone out of the loop, reporting
    # fantasy rates (measured: 2.3M alerts/s "fwd")
    images = images + carry.astype(images.dtype)
    step_rng = jax.random.fold_in(state.rng, state.step)
    aug_rng, dropout_rng = jax.random.split(step_rng)
    if do_aug:
        images = augment_triplets(aug_rng, images)
    if variant == "fwd":
        loss, new_stats = loss_fn(state.params, state.batch_stats, images,
                                  metadata, labels, dropout_rng)
        return state.replace(step=state.step + 1,
                             batch_stats=new_stats), loss
    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, state.batch_stats, images,
                               metadata, labels, dropout_rng)
    if variant == "fwd_bwd":
        # keep the grads live without the optimizer: fold their global norm
        # into the carried loss scalar
        gn = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)).astype(jnp.float32),
            grads, jnp.float32(0.0))
        return state.replace(step=state.step + 1,
                             batch_stats=new_stats), loss + gn * 1e-20
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         batch_stats=new_stats, opt_state=new_opt), loss

@jax.jit
def epoch(state, images, metadata, labels):
    def body(carry, _):
        st, prev = carry
        st, loss = one_step(st, prev * 1e-20, images, metadata, labels)
        return (st, loss), loss
    (state, _), losses = jax.lax.scan(
        body, (state, jnp.float32(0.0)), None, length=iters)
    return state, jnp.mean(losses)

rng = np.random.default_rng(0)
images = jax.device_put(jnp.asarray(
    rng.normal(size=(batch, 63, 63, 3)), jnp.bfloat16))
metadata = jax.device_put(jnp.asarray(
    rng.normal(size=(batch, 25)), jnp.bfloat16))
labels = jax.device_put(jnp.asarray(rng.random(batch) < 0.5, jnp.float32))

state, loss = epoch(state, images, metadata, labels)
assert np.isfinite(float(loss))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    _, loss = epoch(state, images, metadata, labels)
    float(loss)
    best = min(best, time.perf_counter() - t0)
print("RESULT " + json.dumps({"alerts_per_s": round(batch * iters / best, 1)}))
"""

TRAIN_FLAG_SETS = {
    "vmem_32m (adopted serving flag)": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "baseline": "",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
}


def run_child(kind: str, batch: int, variant: str, flags: str | None = None,
              timeout: int = 900):
    env = {**os.environ}
    if flags is not None:
        if flags:
            env["LIBTPU_INIT_ARGS"] = flags
        else:
            env.pop("LIBTPU_INIT_ARGS", None)
    else:
        env.setdefault("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=32768")
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             CHILD % {"repo": REPO, "kind": kind, "batch": batch,
                      "variant": variant}],
            env=env, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return "timeout"
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    if not lines:
        return f"failed: {out.stdout[-200:]} {out.stderr[-300:]}"
    return json.loads(lines[-1][7:])["alerts_per_s"]


def roofline(batch: int = 4096) -> dict:
    """FLOPs/bytes of the FULL jitted train step from XLA cost analysis on
    the in-process CPU backend (the remote-TPU compile would cost minutes).

    Honesty note (r3 review): FLOP counts are backend-stable to a few %,
    but "bytes accessed" depends on backend-specific fusion and layout —
    the derived intensity / memory_bound / hbm_time values are CPU-compile
    ESTIMATES, not on-chip measurements (the JSON carries a bytes_source
    marker).  perf_sweep.py's inference roofline reads the TPU executable's
    own cost analysis and is the methodology to prefer where available."""
    os.environ.setdefault("JAX_PLATFORMS", "")
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import FLAGSHIP_CONFIG
    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.engine.state import create_train_state, make_optimizer
    from btsbot_tpu.engine.steps import make_train_step

    cfg = normalize_config({**FLAGSHIP_CONFIG, "compute_dtype": "bfloat16"})
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, variables = init_model(cfg, rng=0, dtype=jnp.bfloat16)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(cfg, variables, tx, seed=0)
        step = make_train_step(model, tx, cfg)
        lowered = jax.jit(
            lambda st, i, m, lb: step.inner(st, i, m, lb,
                                            jnp.float32(1.17), None)).lower(
            state, jnp.zeros((batch, 63, 63, 3), jnp.bfloat16),
            jnp.zeros((batch, 25), jnp.bfloat16),
            jnp.zeros((batch,), jnp.float32))
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    intensity = flops / byts if byts else float("nan")
    ridge = 197e12 / 819e9  # v5e bf16 peak / HBM BW
    return {
        "batch": batch,
        "bytes_source": "cpu_compile_estimate",  # see docstring
        "train_flops_per_alert": round(flops / batch),
        "train_bytes_per_alert": round(byts / batch),
        "arithmetic_intensity_flops_per_byte": round(intensity, 1),
        "v5e_ridge_point_flops_per_byte": round(ridge, 1),
        "memory_bound": bool(intensity < ridge),
        "hbm_time_ms_per_batch": round(byts / 819e9 * 1e3, 3),
        "mxu_time_ms_per_batch": round(flops / 197e12 * 1e3, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--roofline", action="store_true")
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--attr", action="store_true")
    p.add_argument("--flags", action="store_true")
    p.add_argument("--batch", type=int, default=8192)
    args = p.parse_args()
    run_all = not (args.roofline or args.sweep or args.flags or args.attr)

    study: dict = {}
    if args.roofline or run_all:
        study["roofline"] = roofline()
        print(json.dumps(study["roofline"], indent=1), flush=True)

    best_batch = args.batch
    if args.sweep or run_all:
        batches = {}
        for batch in (4096, 8192, 16384):
            batches[str(batch)] = run_child("convnext_pico.d1_in1k", batch,
                                            "full")
            print(f"batch {batch}: {batches[str(batch)]}", flush=True)
        study["batch_sweep_bf16_full_step"] = batches
        numeric = {int(k): v for k, v in batches.items()
                   if isinstance(v, (int, float))}
        best_batch = max(numeric, key=numeric.get) if numeric else args.batch

    if args.attr or args.sweep or run_all:
        attribution = {}
        for variant in ("fwd", "fwd_bwd", "no_aug", "full"):
            attribution[variant] = run_child("convnext_pico.d1_in1k",
                                             best_batch, variant)
            print(f"{variant}: {attribution[variant]}", flush=True)
        study["attribution_at_best_batch"] = {
            "batch": best_batch, **attribution}

        study["inceptionnext_pico_r2_full_step"] = run_child(
            "inceptionnext_pico.r2", best_batch, "full")
        print(f"inceptionnext .r2: "
              f"{study['inceptionnext_pico_r2_full_step']}", flush=True)

    if args.flags or run_all:
        flags = {}
        bb = 8192
        for name, fs in TRAIN_FLAG_SETS.items():
            flags[name] = run_child("convnext_pico.d1_in1k", bb, "full",
                                    flags=fs)
            print(f"flag {name}: {flags[name]}", flush=True)
        study["flag_sweep_full_step_batch8192"] = flags

    path = os.path.join(REPO, "docs", "perf_sweep.json")
    merged = {}
    if os.path.isfile(path):
        with open(path) as f:
            merged = json.load(f)
    merged.setdefault("train_step_study_r3", {}).update(study)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print("TRAIN_SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
