"""A/B the ``dwconv_dense`` lowering under bench.py's exact conditions.

dwconv_dense_experiment.py (monkeypatch harness) measured in-graph wins for
the diagonal-dense dwconv lowering, but its baseline ran without bench.py's
measured-vmem flag and with closure-captured weights; this script settles it
with bench.py's own ``build_scorer`` + ``bench_batch`` (weights as jit
arguments, LIBTPU scoped-vmem 32 MB, scan-chained honest timing) on the
flagship mm_ConvNeXt-pico serving graph, plus an on-device full-model parity
check between the two lowerings on identical weights.

Run: python scripts/dwconv_dense_ab.py  (TPU; ~5 min)
Results: docs/dwconv_dense_experiment.json (key "bench_ab") + stdout.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — sets LIBTPU flags on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def parity_check(batch: int = 256) -> dict:
    """Same weights through both lowerings on the DEVICE.

    Measured (this script, v5e, 2026-08-19): in f32 the two lowerings'
    LOGITS differ by ~1.2e-3 — the depthwise form runs on the VPU in true
    f32 while the dense form runs on the MXU at XLA's DEFAULT precision
    (bf16 multiplies, f32 accumulate).  The math is identical (the CPU test
    proves bit-equality); the difference is TPU matmul precision, so
    ``dwconv_dense`` is a bf16-SERVING optimization, not for f32 bit-parity
    paths.  The gate here is therefore the bf16 SCORE agreement between the
    two forms — where both already quantize — at the bf16 serving noise
    level."""
    from __graft_entry__ import FLAGSHIP_CONFIG

    from btsbot_tpu import init_model, normalize_config

    rng = np.random.default_rng(0)
    img32 = rng.normal(size=(batch, 63, 63, 3)).astype(np.float32)
    meta32 = rng.normal(size=(batch, 25)).astype(np.float32)

    out = {}
    for dtype, dense_mode, key in (
            (jnp.float32, True, "f32_logit_maxdiff"),
            (jnp.float32, "highest", "f32_highest_logit_maxdiff"),
            (jnp.bfloat16, True, "bf16_score_maxdiff")):
        cfg_dw = normalize_config(dict(FLAGSHIP_CONFIG))
        cfg_dd = normalize_config({**FLAGSHIP_CONFIG,
                                   "dwconv_dense": dense_mode})
        model_dw, variables = init_model(cfg_dw, rng=0, dtype=dtype)
        model_dd, _ = init_model(cfg_dd, rng=0, dtype=dtype)
        img = jnp.asarray(img32, dtype)
        meta = jnp.asarray(meta32, dtype)
        o_dw = jax.jit(lambda v, i, m, mod=model_dw: mod.apply(
            v, image_input=i, metadata_input=m, train=False))(
                variables, img, meta)
        o_dd = jax.jit(lambda v, i, m, mod=model_dd: mod.apply(
            v, image_input=i, metadata_input=m, train=False))(
                variables, img, meta)
        if dtype == jnp.bfloat16:
            o_dw = jax.nn.sigmoid(o_dw.astype(jnp.float32))
            o_dd = jax.nn.sigmoid(o_dd.astype(jnp.float32))
        out[key] = float(jnp.max(jnp.abs(o_dd - o_dw)))
    return out


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    parity = parity_check()
    print(f"on-device parity: {json.dumps(parity)}", flush=True)
    # bf16 serving scores must agree within bf16 quantization noise; the
    # f32 logit delta (MXU default precision) is recorded, not gated
    assert parity["bf16_score_maxdiff"] < 0.01, \
        "dense lowering diverged beyond bf16 serving noise"

    from __graft_entry__ import FLAGSHIP_CONFIG

    results = {"parity": parity, "runs": {}, "runs_f32": {}}
    for label, cfg in (
            ("dwconv", None),
            ("dwconv_dense", {**FLAGSHIP_CONFIG, "dwconv_dense": True})):
        score, variables = bench.build_scorer(jnp.bfloat16, iters=50,
                                              config=cfg)
        rates = {}
        for batch in (3072, 4096, 6144):
            rates[batch] = round(bench.bench_batch(
                score, variables, batch, jnp.bfloat16), 1)
            print(f"{label} batch={batch}: {rates[batch]:,.0f} alerts/s",
                  flush=True)
        results["runs"][label] = rates

    best_dw = max(results["runs"]["dwconv"].values())
    best_dd = max(results["runs"]["dwconv_dense"].values())
    results["speedup_best"] = round(best_dd / best_dw, 4)
    print(f"best: dwconv {best_dw:,.0f}  dense {best_dd:,.0f}  "
          f"speedup {results['speedup_best']}x", flush=True)

    # f32 leg: does the 3-pass MXU dense form (precision=HIGHEST) beat the
    # true-f32 VPU depthwise while keeping f32 parity?  If yes the lowering
    # stops being bf16-only.
    for label, cfg in (
            ("dwconv", None),
            ("dwconv_dense_highest",
             {**FLAGSHIP_CONFIG, "dwconv_dense": "highest"})):
        score, variables = bench.build_scorer(jnp.float32, iters=50,
                                              config=cfg)
        rates = {}
        for batch in (3072, 4096):
            rates[batch] = round(bench.bench_batch(
                score, variables, batch, jnp.float32), 1)
            print(f"f32 {label} batch={batch}: {rates[batch]:,.0f} alerts/s",
                  flush=True)
        results["runs_f32"][label] = rates
    best_dw32 = max(results["runs_f32"]["dwconv"].values())
    best_hi32 = max(results["runs_f32"]["dwconv_dense_highest"].values())
    results["speedup_f32_highest"] = round(best_hi32 / best_dw32, 4)
    print(f"f32 best: dwconv {best_dw32:,.0f}  dense-highest "
          f"{best_hi32:,.0f}  speedup {results['speedup_f32_highest']}x",
          flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "dwconv_dense_experiment.json")
    data = {}
    if os.path.exists(out):
        with open(out) as f:
            data = json.load(f)
    data["bench_ab"] = results
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
