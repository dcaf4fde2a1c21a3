"""Torch-default parameter initialization (the reference's starting point).

Every reference model trains from torch's implicit module defaults
(``torch.nn.Conv2d``/``Linear`` reset_parameters: kaiming_uniform(a=√5)
kernels and U(±1/√fan_in) biases — exercised by the reference trainer at
/root/reference/btsbot/train.py:218-222 via plain module construction).
Flax's defaults differ (lecun_normal kernels — 3× the variance of torch's
uniform — and zero biases), and the difference is measurable in trained
quality: on the trainer-parity fixture our mm_ConvNeXt reaches mean ROC-AUC
0.9668 from flax defaults vs 0.9738 from torch defaults (reference trainer:
0.9747 ± 0.0004; docs/trainer_parity.json).  Torch-matched init is therefore
the package default; ``init_scheme: "flax"`` restores the old behavior.

Both torch layer inits reduce to the same closed form: kaiming_uniform with
a=√5 has gain √(2/(1+a²)) = √(1/3), so the kernel bound
√3·gain/√fan_in = 1/√fan_in — identical to the bias bound.  The rule applied
here: every ``kernel`` leaf (and any ``bias`` sharing its dict node) is
redrawn U(±1/√fan_in) with fan_in = prod(kernel.shape[:-1]) (matches torch's
fan_in for both Linear (in,) and Conv HWIO (h·w·in,) layouts).  All other
leaves keep their flax init — LayerNorm/BatchNorm scale=1/bias=0 already
equal torch's defaults, and specialty params (layer-scale γ=1e-6, MaxViT
relative-position tables) are architecture-defined, not torch-module
defaults.

Keys are derived per-leaf by folding a CRC32 of the parameter path into the
base key, so the draw is independent of dict iteration order and stable
across refactors that do not rename parameters.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp


def _bound(kernel_shape) -> float:
    fan_in = 1
    for d in kernel_shape[:-1]:
        fan_in *= int(d)
    return 1.0 / float(fan_in) ** 0.5


def torch_default_reinit(rng: jax.Array, params):
    """Redraw kernel/bias leaves of a flax params tree at torch defaults.

    Returns a new tree; dtypes and shapes are preserved.  Leaves other than
    ``kernel`` (and ``bias`` next to a ``kernel``) are returned unchanged.
    """
    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        kernel = node.get("kernel")
        has_kernel = kernel is not None and getattr(kernel, "ndim", 0) >= 2
        for name, child in node.items():
            child_path = f"{path}/{name}"
            if name == "kernel" and has_kernel:
                b = _bound(kernel.shape)
            elif name == "bias" and has_kernel:
                b = _bound(kernel.shape)
            else:
                out[name] = walk(child, child_path)
                continue
            key = jax.random.fold_in(
                rng, zlib.crc32(child_path.encode()) & 0x7FFFFFFF)
            out[name] = jax.random.uniform(
                key, child.shape, jnp.float32, -b, b).astype(child.dtype)
        return out

    return walk(params, "")
