"""Stage-0 dwconv-as-dense-conv experiment (MXU vs VPU routing).

Stage 0 of ConvNeXt-pico at 63x63 inputs runs 7x7 depthwise convs on
(N, 15, 15, 64) maps.  XLA lowers feature_group_count=C convs onto the VPU,
which is the measured bottleneck (~55% of inference time, half-occupied
lanes at C=64; see dwconv_pack_experiment.py).  Hypothesis: expand the
depthwise kernel into a diagonal-masked DENSE kernel
(K[kh,kw,cin,cout] = dw[kh,kw,cin] * [cin==cout], feature_group_count=1) so
XLA maps the op onto the MXU via implicit im2col.  64x more FLOPs, but the
MXU/VPU throughput ratio on v5e is ~100x, so the dense form could still win
wall-clock.  The transform is exact (same math, zeros contribute nothing),
needs no retraining, and can be applied at weight-load time for serving.

Run: python scripts/dwconv_dense_experiment.py  (TPU; ~2 min)

Results land in docs/dwconv_dense_experiment.json and are recorded in this
docstring after measurement (the repo convention: measured numbers only —
see dwconv_pack_experiment.py precedent).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=50):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(*(x + carry if i == 0 else x for i, x in enumerate(a)))
            return (jnp.mean(out) * 1e-20).astype(a[0].dtype), jnp.mean(out)
        _, means = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                length=iters)
        return jnp.mean(means)

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def dw_conv(x, k):
    # k: (7, 7, 1, C) — flax depthwise layout
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dense_diag_conv(x, kdense):
    # kdense: (7, 7, C, C) diagonal-expanded — same math, fgc=1
    return lax.conv_general_dilated(
        x, kdense, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def expand_diag(k):
    c = k.shape[-1]
    return (k[:, :, 0, :, None] * jnp.eye(c, dtype=k.dtype)[None, None])


def bench_op(batch, hw, c, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, c)), dtype)
    k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, dtype)
    kd = expand_diag(k)
    # parity first (f32 to isolate routing, not rounding)
    a = dw_conv(x.astype(jnp.float32), k.astype(jnp.float32))
    b = dense_diag_conv(x.astype(jnp.float32), kd.astype(jnp.float32))
    maxdiff = float(jnp.max(jnp.abs(a - b)))
    t_dw = timed(dw_conv, x, k)
    t_dense = timed(dense_diag_conv, x, kd)
    return {"shape": [batch, hw, hw, c], "maxdiff_f32": maxdiff,
            "dw_ms": round(t_dw * 1e3, 1),
            "dense_ms": round(t_dense * 1e3, 1),
            "speedup": round(t_dw / t_dense, 3)}


def bench_full_model(mode, batch=3072, dtype=jnp.bfloat16):
    """Full mm_ConvNeXt-pico forward with dwconvs optionally re-expressed
    as diagonal-dense convs at the given stages (weight-load-time
    transform)."""
    from __graft_entry__ import FLAGSHIP_CONFIG

    from btsbot_tpu import init_model
    from btsbot_tpu.core.config import normalize_config

    config = normalize_config(dict(FLAGSHIP_CONFIG))
    model, variables = init_model(config, rng=0, dtype=dtype)

    # collect the depthwise kernels by stage index from the param tree
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    dense_stages = {"none": (), "stage0": (0,),
                    "all": (0, 1, 2, 3)}[mode]

    def apply_fn(img, meta):
        if not dense_stages:
            return model.apply(variables, image_input=img,
                               metadata_input=meta, train=False)
        # rewrite: intercept depthwise convs via a param-tree transform is
        # invasive; instead monkeypatch lax at trace time (test-only).
        orig = lax.conv_general_dilated

        def routed(x, k, *a, **kw):
            fgc = kw.get("feature_group_count", 1)
            if fgc > 1 and k.shape[0] == 7 and fgc == x.shape[-1]:
                stage_idx = {64: 0, 128: 1, 256: 2, 512: 3}.get(fgc, -1)
                if stage_idx in dense_stages:
                    kw = dict(kw)
                    kw["feature_group_count"] = 1
                    return orig(x, expand_diag(k), *a, **kw)
            return orig(x, k, *a, **kw)

        lax.conv_general_dilated = routed
        try:
            return model.apply(variables, image_input=img,
                               metadata_input=meta, train=False)
        finally:
            lax.conv_general_dilated = orig

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(batch, 63, 63, 3)), dtype)
    meta = jnp.asarray(
        rng.normal(size=(batch, len(config["metadata_cols"]))), dtype)
    t = timed(apply_fn, img, meta)
    return {"mode": mode, "ms": round(t * 1e3, 1),
            "alerts_per_s": round(batch * 50 / t)}


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    results = {"op_level": [], "full_model": []}
    for batch, hw, c in ((3072, 15, 64), (3072, 8, 128)):
        r = bench_op(batch, hw, c)
        print(json.dumps(r), flush=True)
        results["op_level"].append(r)
    for mode in ("none", "stage0", "all"):
        r = bench_full_model(mode)
        print(json.dumps(r), flush=True)
        results["full_model"].append(r)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "dwconv_dense_experiment.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
