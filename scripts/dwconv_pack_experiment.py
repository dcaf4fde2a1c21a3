"""Stage-0 dwconv lane-packing experiment (measured; see results below).

Stage 0 of ConvNeXt-pico at 63×63 inputs runs 7×7 depthwise convs on
(N, 15, 15, 64) maps — C=64 fills only half of the VPU's 128 lanes, and
round-1 profiling put stage 0 at ~55% of inference time.  Hypothesis: pack
two batch elements into the channel axis ((N, 15, 15, 64) →
(N/2, 15, 15, 128), weights tiled 2×) so the depthwise conv runs with full
lanes, then unpack.  Depthwise semantics make the packing exact (channels
are independent).

Measured on TPU v5e (bf16, batch 3072, honest scan-chained timing,
2026-08-16, this script; times are per 50 chained iterations):

    dwconv unpacked (N,15,15,64):     100.1 ms
    dwconv packed   (N/2,15,15,128):   72.7 ms  (1.38x — the dwconv IS
                                                 lane-limited at C=64)
    packed incl. pack/unpack:         202.4 ms  (0.49x net)

Conclusion: the hypothesis is half right — full 128-lane occupancy speeds
the depthwise conv 1.38× — but the batch→channel interleave transposes
cost ~2.6 ms/iteration, ~6× their pure-bandwidth floor (sublane-hostile
permutation), which is more than the entire conv.  Amortizing one
pack/unpack pair across stage 0's two blocks still loses (~2.6 ms added
vs ~1.1 ms saved), so lane-packing is a measured dead end at these
shapes.  Kept as a negative-result record per the repo convention
(ops/pallas_convnext.py precedent).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    # best-of-3 to damp relay jitter (r3 review: the recorded 1.38x/0.49x
    # numbers in the module docstring came from single-shot timings)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dtype = jnp.bfloat16
    n, hw, c = 3072, 15, 64
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.normal(size=(n, hw, hw, c)), dtype))
    w = jnp.asarray(rng.normal(size=(7, 7, 1, c)), dtype)
    w2 = jnp.concatenate([w, w], axis=-1)

    def dw(x_, weights, groups):
        return jax.lax.conv_general_dilated(
            x_, weights, (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)

    t_plain = timed(lambda a: dw(a, w, c), x)

    xp = jax.device_put(jnp.asarray(
        rng.normal(size=(n // 2, hw, hw, 2 * c)), dtype))
    t_packed = timed(lambda a: dw(a, w2, 2 * c), xp)

    def packed_e2e(a):
        p = a.reshape(n // 2, 2, hw, hw, c).transpose(0, 2, 3, 1, 4)
        p = p.reshape(n // 2, hw, hw, 2 * c)
        y = dw(p, w2, 2 * c)
        y = y.reshape(n // 2, hw, hw, 2, c).transpose(0, 3, 1, 2, 4)
        return y.reshape(n, hw, hw, c)

    t_e2e = timed(packed_e2e, x)

    print(f"dwconv (N,15,15,64):    {t_plain*1e3:7.2f} ms / 50 iters")
    print(f"dwconv (N/2,15,15,128): {t_packed*1e3:7.2f} ms "
          f"({t_plain/t_packed:.2f}x)")
    print(f"packed incl. reshapes:  {t_e2e*1e3:7.2f} ms "
          f"({t_plain/t_e2e:.2f}x)")


if __name__ == "__main__":
    main()
