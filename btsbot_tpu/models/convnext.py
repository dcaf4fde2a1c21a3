"""ConvNeXt backbone, NHWC / TPU-native.

Re-implementation of the ConvNeXt-v1 family (Liu et al. 2022) matching the
timm checkpoints the reference builds on (`timm/convnext_pico.d1_in1k`,
`mwalmsley/zoobot-encoder-convnext_pico`, `timm/convnext_nano.d1h_in1k` —
reference from_HF.py / to_HF.py:165-177 and architectures.py:104-171)
op-for-op so converted weights are bit-exact:

* patchify stem: Conv 4×4/4 + LayerNorm (eps 1e-6);
* stage downsampling: LayerNorm + Conv 2×2/2;
* block: depthwise Conv 7×7 (SAME) → LayerNorm → Dense(4·dim) → exact GELU →
  Dense(dim) → layer-scale γ (init 1e-6) → residual;
* head: global average pool → LayerNorm → Dense stack (added by the wrapper
  models below, mirroring the reference's head surgery).

Everything runs channels-last, which is both the TPU-native layout and
ConvNeXt's own internal layout for norm/MLP (torch implementations permute
NCHW→NHWC inside every block; we never leave NHWC).

Head-surgery parity with the reference:

* ``ConvNeXtClassifier`` (reference ``ConvNeXt``, architectures.py:104-122):
  pool → norm → flatten → Dense(fc1) → GELU → Dense(fc2) → GELU → Dropout →
  Dense(1);
* ``MmConvNeXt`` (reference ``mm_ConvNeXt``, architectures.py:125-171): the
  backbone head keeps pool+norm+flatten only when "LS" is in
  ``train_data_version`` (:137-143), else raw flatten of the final feature
  map (which is 1×1 spatial for 63×63 inputs); fused with the metadata
  branch through the combined head.
"""

from __future__ import annotations

import re
import warnings
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    CombinedHead,
    ImageHead,
    MetadataBranch,
    check_inputs,
    gelu_exact,
)

Dtype = Any

# depths / dims for the timm ConvNeXt model names used by BTSbot checkpoints.
CONVNEXT_CONFIGS: dict[str, dict] = {
    "convnext_atto": {"depths": (2, 2, 6, 2), "dims": (40, 80, 160, 320)},
    "convnext_femto": {"depths": (2, 2, 6, 2), "dims": (48, 96, 192, 384)},
    "convnext_pico": {"depths": (2, 2, 6, 2), "dims": (64, 128, 256, 512)},
    "convnext_nano": {"depths": (2, 2, 8, 2), "dims": (80, 160, 320, 640)},
    "convnext_tiny": {"depths": (3, 3, 9, 3), "dims": (96, 192, 384, 768)},
    "convnext_small": {"depths": (3, 3, 27, 3), "dims": (96, 192, 384, 768)},
    "convnext_base": {"depths": (3, 3, 27, 3), "dims": (128, 256, 512, 1024)},
}


def convnext_spec(model_kind: str) -> dict:
    """Resolve a timm-style model string (e.g. 'convnext_pico.d1_in1k' or
    'mwalmsley/zoobot-encoder-convnext_pico') to depths/dims.

    TPU-native ``inceptionnext_<size>`` kinds reuse the matching ConvNeXt
    size but swap the 7x7 depthwise token mixer for the decomposed
    InceptionNeXt mixer (see InceptionMixer) — train-from-scratch variants,
    not convertible from timm ConvNeXt checkpoints."""
    m = re.search(r"inceptionnext_([a-z]+)", model_kind)
    if m:
        base = f"convnext_{m.group(1)}"
        if base not in CONVNEXT_CONFIGS:
            raise ValueError(
                f"Unknown InceptionNeXt variant in model_kind: {model_kind}")
        spec = {**CONVNEXT_CONFIGS[base], "token_mixer": "inception"}
        # serving-oriented MLP-width knob: '.r<k>' shrinks the block MLP
        # expansion from 4x to kx (measured: the extra 3x width is 34% of
        # inceptionnext_pico serving time at batch 4096 on v5e, while the
        # mixer is 18% — docs/perf_sweep.json attribution study).  Train
        # from scratch or distill; not timm-checkpoint-compatible.
        r = re.search(r"\.r(\d+)", model_kind)
        if r:
            spec["mlp_ratio"] = int(r.group(1))
        return spec
    m = re.search(r"(convnext_[a-z]+)", model_kind)
    if not m or m.group(1) not in CONVNEXT_CONFIGS:
        raise ValueError(f"Unknown ConvNeXt variant in model_kind: {model_kind}")
    return CONVNEXT_CONFIGS[m.group(1)]


class InceptionMixer(nn.Module):
    """InceptionNeXt-style decomposed token mixer (Yu et al. 2023,
    arXiv:2303.16900): channels split 1/8 dw3×3 + 1/8 dw1×11 + 1/8 dw11×1 +
    5/8 identity, replacing the 7×7 depthwise conv.

    TPU rationale: the 7×7 dwconv is this workload's measured bottleneck —
    VPU-ALU-bound at 49 taps with half-occupied lanes at stage-0 shapes
    (docs/perf_sweep.json); this mixer is 1.96× faster at (3072,15,15,64)
    bf16 (measured on v5e).  Used by the TPU-native ``inceptionnext_*``
    model kinds — NOT checkpoint-compatible with timm ConvNeXt (train from
    scratch, or distill)."""

    dim: int
    band: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = max(1, self.dim // 8)
        xs = jnp.split(x, [g, 2 * g, 3 * g], axis=-1)
        y0 = nn.Conv(g, (3, 3), padding="SAME", feature_group_count=g,
                     dtype=self.dtype, name="dw_square")(xs[0])
        y1 = nn.Conv(g, (1, self.band), padding="SAME",
                     feature_group_count=g, dtype=self.dtype,
                     name="dw_band_w")(xs[1])
        y2 = nn.Conv(g, (self.band, 1), padding="SAME",
                     feature_group_count=g, dtype=self.dtype,
                     name="dw_band_h")(xs[2])
        return jnp.concatenate([y0, y1, y2, xs[3]], axis=-1)


class DWConvDense(nn.Module):
    """7×7 depthwise conv applied as a diagonal-expanded DENSE conv.

    Param tree is bit-identical to ``nn.Conv(dim, (7, 7),
    feature_group_count=dim)`` — kernel (7, 7, 1, dim) + bias (dim,), same
    initializers and RNG path — so checkpoints, converters, and exporters
    are unaffected; only the lowering changes.  The diagonal expansion
    ``K[kh, kw, cin, cout] = kernel[kh, kw, 0, cout]·[cin==cout]`` is exact
    (off-diagonal zeros contribute nothing) and routes the op through XLA's
    dense-conv path instead of the grouped/VPU path.

    MEASURED NEGATIVE under real bench conditions — kept for the record, do
    not enable in production (repo precedent: ops/pallas_*.py,
    ops/quantized.py).  The round-4 monkeypatch harness
    (scripts/dwconv_dense_experiment.py) showed a +13% full-model win, but
    under bench.py's own conditions (weights as jit arguments, 32 MB
    scoped-vmem flag, scan-chained honest timing —
    scripts/dwconv_dense_ab.py, v5e 2026-08-19) the dense form is a clear
    LOSS: bf16 serving 285.8k vs 473.0k alerts/s (0.60×), f32
    precision=HIGHEST 43.9k vs 102.5k (0.43×), and the full bf16 TRAIN
    step 55.1k vs 81.7k (0.67× — scripts/dwconv_dense_train_ab.py).  The
    monkeypatch win came from its unrepresentative baseline
    (closure-captured weights, no vmem flag).  Findings that remain
    useful: the 3-pass ``precision='highest'`` dense form is BIT-EXACT vs
    the f32 VPU depthwise on-chip (maxdiff 0.0), the default-precision form
    shifts f32 logits ~1.2e-3 (MXU bf16 multiplies), and in bf16 both
    forms' scores agree exactly at serving noise (gated <0.01).  HBM cost
    of the expansion: (7, 7, C, C) per block — ~196 MB f32/block at
    C=1024, so ``_backbone_from_config`` caps the lowering at
    ``DWCONV_DENSE_MAX_DIM`` channels.  Full numbers:
    docs/dwconv_dense_experiment.json (key ``bench_ab``)."""

    dim: int
    dtype: Dtype = jnp.float32
    # None → XLA default (bf16 multiplies on the MXU, fastest); "highest" →
    # lax.Precision.HIGHEST (3-pass bf16 = f32-accurate MXU, measured in
    # scripts/dwconv_dense_ab.py for whether it preserves f32 parity at a win)
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        kernel, bias, x = nn.dtypes.promote_dtype(
            kernel, bias, x, dtype=self.dtype)
        # (7, 7, cin, cout) with kd[.., c, c] = kernel[.., 0, c]: HWIO layout
        kd = kernel[:, :, 0, :, None] * jnp.eye(self.dim, dtype=kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x, kd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision)
        return y + bias


class ConvNeXtBlock(nn.Module):
    dim: int
    ls_init_value: float = 1e-6
    token_mixer: str = "dwconv7"
    dtype: Dtype = jnp.float32
    mlp_ratio: float = 4.0
    # False | True (XLA default precision) | "highest" (3-pass MXU)
    dwconv_dense: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if self.token_mixer == "inception":
            x = InceptionMixer(self.dim, dtype=self.dtype, name="mixer")(x)
        elif self.dwconv_dense:
            prec = ("highest" if str(self.dwconv_dense).lower() == "highest"
                    else None)
            x = DWConvDense(self.dim, dtype=self.dtype, precision=prec,
                            name="conv_dw")(x)
        else:
            x = nn.Conv(
                self.dim, (7, 7), padding="SAME",
                feature_group_count=self.dim,
                dtype=self.dtype, name="conv_dw",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(int(self.mlp_ratio * self.dim), dtype=self.dtype,
                     name="mlp_fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(x)
        if self.ls_init_value is not None:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.ls_init_value),
                (self.dim,))
            x = x * gamma.astype(x.dtype)
        return shortcut + x


# dwconv_dense is only applied to stages at or below this channel width: the
# diagonal kernel is (7,7,C,C) per block (~196 MB f32/block at C=1024) and
# the lowering was only measured to win at pico-scale widths (<=512).
DWCONV_DENSE_MAX_DIM = 512


class ConvNeXtStage(nn.Module):
    dim: int
    depth: int
    downsample: bool
    ls_init_value: float = 1e-6
    token_mixer: str = "dwconv7"
    dtype: Dtype = jnp.float32
    mlp_ratio: float = 4.0
    dwconv_dense: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.downsample:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="downsample_norm")(x)
            x = nn.Conv(self.dim, (2, 2), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name="downsample_conv")(x)
        for b in range(self.depth):
            x = ConvNeXtBlock(self.dim, self.ls_init_value,
                              self.token_mixer, self.dtype,
                              mlp_ratio=self.mlp_ratio,
                              dwconv_dense=self.dwconv_dense,
                              name=f"block{b}")(x)
        return x


class ConvNeXtBackbone(nn.Module):
    """Feature extractor: NHWC in, final feature map (N, h, w, dims[-1]) out."""

    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    ls_init_value: float = 1e-6
    token_mixer: str = "dwconv7"
    dtype: Dtype = jnp.float32
    mlp_ratio: float = 4.0
    dwconv_dense: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            x = ConvNeXtStage(
                dim=dim, depth=depth, downsample=(s > 0),
                ls_init_value=self.ls_init_value,
                token_mixer=self.token_mixer, dtype=self.dtype,
                mlp_ratio=self.mlp_ratio,
                dwconv_dense=(self.dwconv_dense
                              if dim <= DWCONV_DENSE_MAX_DIM else False),
                name=f"stage{s}",
            )(x)
        return x


def _backbone_from_config(config, dtype) -> ConvNeXtBackbone:
    spec = convnext_spec(config.get("model_kind", "convnext_nano.d1h_in1k"))
    mixer = spec.get("token_mixer", "dwconv7")
    dwconv_dense = config.get("dwconv_dense", False) or False
    if dwconv_dense and mixer == "inception":
        warnings.warn(
            "dwconv_dense has no effect with the InceptionNeXt mixer "
            "(no 7x7 depthwise convs to re-lower); ignoring the flag",
            stacklevel=2)
        dwconv_dense = False
    highest = str(dwconv_dense).lower() == "highest"
    if dwconv_dense and not highest and jnp.dtype(dtype) == jnp.float32:
        warnings.warn(
            "dwconv_dense with an f32 compute dtype breaks the <1e-5 f32 "
            "bit-parity invariant on TPU (the dense form runs on the MXU at "
            "XLA default precision, ~1.2e-3 logit delta); intended for bf16 "
            "serving only — use dwconv_dense: 'highest' for an f32-accurate "
            "3-pass MXU form, or see docs/CONFIG.md", stacklevel=2)
    return ConvNeXtBackbone(
        depths=spec["depths"], dims=spec["dims"],
        token_mixer=mixer, dtype=dtype,
        mlp_ratio=spec.get("mlp_ratio", 4.0),
        dwconv_dense=dwconv_dense,
        name="backbone")


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, C) average pool (timm SelectAdaptivePool2d 'avg')."""
    return jnp.mean(x, axis=(1, 2))


class ConvNeXtClassifier(nn.Module):
    """Image-only ConvNeXt (reference ``ConvNeXt``, architectures.py:104-122)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("ConvNeXt", image_input, metadata_input)
        x = _backbone_from_config(self.config, self.dtype)(image_input)
        x = global_avg_pool(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        return ImageHead(
            fc1=self.config["fc1_neurons"],
            fc2=self.config["fc2_neurons"],
            dropout=self.config["dropout"],
            activation="gelu",
            dtype=self.dtype,
            name="head",
        )(x, train=train)


class MmConvNeXt(nn.Module):
    """Multi-modal ConvNeXt (reference ``mm_ConvNeXt``, architectures.py:125-171)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("mm_ConvNeXt", image_input, metadata_input)
        x = _backbone_from_config(self.config, self.dtype)(image_input)
        if "LS" in self.config.get("train_data_version", ""):
            # pool + norm + flatten head variant (architectures.py:137-141)
            x = global_avg_pool(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        else:
            # flatten-only head (architectures.py:143); final map is 1×1
            # spatial for 63×63 inputs so this is just (N, C).
            x = x.reshape((x.shape[0], -1))
        meta = MetadataBranch(
            fc1=self.config["meta_fc1_neurons"],
            fc2=self.config["meta_fc2_neurons"],
            dropout=self.config["meta_dropout"],
            activation="gelu",
            dtype=self.dtype,
            name="metadata_branch",
        )(metadata_input, train=train)
        combined = jnp.concatenate([x, meta], axis=1)
        return CombinedHead(
            fc1=self.config["comb_fc1_neurons"],
            fc2=self.config["comb_fc2_neurons"],
            dropout=self.config["comb_dropout"],
            activation="gelu",
            dtype=self.dtype,
            name="combined_head",
        )(combined, train=train)
