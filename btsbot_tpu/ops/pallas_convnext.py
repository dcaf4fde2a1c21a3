"""Fused ConvNeXt block kernel (Pallas / TPU).

One ConvNeXt block is a chain of seven ops (depthwise 7×7 conv → LayerNorm →
Dense 4× → GELU → Dense → layer-scale → residual add).  XLA cannot fuse
across the conv and the two matmuls (each is a separate library call), so at
BTSbot's tiny spatial sizes (15×15 → 1×1) the block is dominated by HBM
round trips and layout-inefficient standalone ops.  This kernel keeps a
batch tile resident in VMEM and does the whole block in one pass:

* depthwise conv as 49 statically-unrolled shifted multiply-accumulates on
  the VPU (f32 accumulation);
* LayerNorm statistics in f32 over the channel axis;
* both MLP matmuls on the MXU (f32 accumulation, tanh-GELU between — see
  models.common.gelu_exact for the bf16 equivalence argument);
* layer-scale γ and the residual add fused into the epilogue.

The public entry ``convnext_block_fused`` is differentiable: a custom VJP
recomputes the reference jnp implementation for the backward pass, so
training keeps exact gradients while serving gets the fused forward.

Weights are expected in the flax ConvNeXtBlock tree layout
(btsbot_tpu.models.convnext.ConvNeXtBlock).

STATUS — measured on TPU v5e (batch 2048, stage-0 shape 15×15×64, bf16):
the fused kernel runs at 7.5 ms/block vs 1.6 ms for the XLA path, because
the statically-unrolled 49-tap depthwise conv on the VPU (with an f32
accumulator tile) loses more than the saved HBM round trips gain — XLA's
native conv + epilogue fusion is already near the achievable floor here.
The kernel is therefore NOT wired into the serving path; it is kept as a
correct, tested reference for block-level fusion (and as the starting point
for an int8 fused variant, where MXU-side conv-as-matmul changes the
trade-off).  The profitable optimization found in the same investigation —
dtype-adaptive GELU — lives in models.common.gelu_exact (2.4× end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM working-set budget (bytes) used to pick the batch tile.
_VMEM_BUDGET = 4 * 1024 * 1024


def _block_reference(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                     b2, gamma):
    """Pure-jnp reference of the block (identical math to the flax module)."""
    shortcut = x
    c = x.shape[-1]
    h = jax.lax.conv_general_dilated(
        x, dw_kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype) + dw_bias
    mu = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h.astype(jnp.float32) - mu), axis=-1,
                   keepdims=True)
    h = ((h.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-6))
    h = h.astype(x.dtype) * ln_scale + ln_bias
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32).astype(
        x.dtype) + b1
    h = jax.nn.gelu(h, approximate=(x.dtype == jnp.bfloat16))
    h = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(
        x.dtype) + b2
    return shortcut + h * gamma


def _kernel(x_ref, dw_w_ref, dw_b_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, gamma_ref, out_ref, *, height, width, chans,
            kh, kw):
    x = x_ref[:]                                    # (TB, H, W, C)
    tb = x.shape[0]
    dtype = x.dtype

    # ---- depthwise conv: statically unrolled shifted MACs, f32 accum
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    dw_w = dw_w_ref[:]                              # (kh, kw, C)
    acc = jnp.zeros((tb, height, width, chans), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            tap = xp[:, dy:dy + height, dx:dx + width, :]
            acc += tap.astype(jnp.float32) * dw_w[dy, dx].astype(jnp.float32)
    h = acc + dw_b_ref[:].astype(jnp.float32)

    # ---- LayerNorm over channels (f32 stats)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-6)
    h = h.astype(dtype) * ln_s_ref[:] + ln_b_ref[:]

    # ---- MLP on the MXU
    m = tb * height * width
    h2 = h.reshape(m, chans)
    h2 = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
    h2 = h2.astype(dtype) + b1_ref[:]
    h2 = jax.nn.gelu(h2, approximate=(dtype == jnp.bfloat16))
    h2 = jnp.dot(h2, w2_ref[:], preferred_element_type=jnp.float32)
    h2 = h2.astype(dtype) + b2_ref[:]

    out_ref[:] = x + (h2 * gamma_ref[:]).reshape(tb, height, width, chans)


def _pick_batch_tile(batch, height, width, chans, itemsize, expand=4):
    per_sample = height * width * chans * itemsize * (2 + expand + 2)
    tb = max(1, _VMEM_BUDGET // max(per_sample, 1))
    while tb > 1 and batch % tb != 0:
        tb -= 1
    return tb


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def convnext_block_fused(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1,
                         w2, b2, gamma, interpret=False):
    return _fused_forward(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1,
                          w2, b2, gamma, interpret)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _fused_forward(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                   gamma, interpret=False):
    b, orig_h, orig_w, chans = x.shape
    kh, kw, _, _ = dw_kernel.shape
    # Mosaic cannot collapse non-8-aligned spatial dims into the matmul M
    # axis; pad H/W up to multiples of 8 (zero rows/cols read as SAME-conv
    # padding, the junk outputs are cropped below).
    height, width = _round_up(orig_h, 8), _round_up(orig_w, 8)
    if (height, width) != (orig_h, orig_w):
        x = jnp.pad(x, ((0, 0), (0, height - orig_h), (0, width - orig_w),
                        (0, 0)))
    tb = _pick_batch_tile(b, height, width, chans, x.dtype.itemsize)
    dtype = x.dtype

    dw_w = dw_kernel.reshape(kh, kw, chans).astype(dtype)
    args = [a.astype(dtype) for a in
            (dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)]

    kernel = functools.partial(_kernel, height=height, width=width,
                               chans=chans, kh=kh, kw=kw)
    flops_mm = 2 * b * height * width * chans * (w1.shape[-1]) * 2
    out = pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, height, width, chans), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma
        ],
        out_specs=pl.BlockSpec((tb, height, width, chans),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * height * width * w1.shape[-1],
        ),
        interpret=interpret,
    )(x, dw_w, *args)
    if (height, width) != (orig_h, orig_w):
        out = out[:, :orig_h, :orig_w, :]
    return out


def _fused_fwd(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
               gamma, interpret=False):
    out = _fused_forward(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1,
                         w2, b2, gamma, interpret)
    return out, (x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                 gamma)


def _fused_bwd(interpret, residuals, g):
    # exact gradients via the jnp reference implementation
    _, vjp = jax.vjp(_block_reference, *residuals)
    return vjp(g)


convnext_block_fused.defvjp(_fused_fwd, _fused_bwd)


def block_params_apply(params, x, interpret=False):
    """Apply the fused block from a flax ConvNeXtBlock param subtree."""
    return convnext_block_fused(
        x,
        params["conv_dw"]["kernel"], params["conv_dw"]["bias"],
        params["norm"]["scale"], params["norm"]["bias"],
        params["mlp_fc1"]["kernel"], params["mlp_fc1"]["bias"],
        params["mlp_fc2"]["kernel"], params["mlp_fc2"]["bias"],
        params["gamma"],
        interpret,
    )
