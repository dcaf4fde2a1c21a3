"""MaxViT backbone (multi-axis attention), NHWC / TPU-native.

Re-implementation of MaxViT (Tu et al. 2022) covering the reference's
``MaxViT``/``mm_MaxViT`` models (`/root/reference/btsbot/architectures.py:25-101`),
which wrap `timm/maxvit_tiny_rw_224.sw_in1k` /
`mwalmsley/baseline-encoder-regression-maxvit_tiny` backbones
(reference to_HF.py:165-177).  Structure per stage block:

    MBConv (pre-norm BN, 1×1 expand ×4, DW 3×3 [stride 2 on first block of a
    stage, avg-pool+1×1 shortcut], SE 0.25, 1×1 project)
    → window ("block") attention over P×P partitions + MLP
    → grid attention over P×P dilated grids + MLP

with relative-position-biased multi-head attention (head dim 32), pre-LN
transformer sublayers, and exact GELU throughout.  The classifier wrappers
reproduce the reference's head surgery:

* the backbone feature is the global-average-pooled final stage output with
  NO norm (the reference keeps only ``head.global_pool``,
  architectures.py:32-33,65);
* inputs are bilinearly resized in-graph to the backbone's native resolution
  (224 for *_224 model kinds — architectures.py:10-22,44-50,90-96).

All spatial partitions are static reshapes/transposes, so XLA maps the
attention matmuls straight onto the MXU; window/grid size is 224/32 = 7.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .common import (
    CombinedHead,
    ImageHead,
    MetadataBranch,
    check_inputs,
    gelu_exact,
)

Dtype = Any

MAXVIT_CONFIGS: dict[str, dict] = {
    "maxvit_tiny": {"depths": (2, 2, 5, 2), "dims": (64, 128, 256, 512),
                    "stem_width": 64},
    "maxvit_small": {"depths": (2, 2, 5, 2), "dims": (96, 192, 384, 768),
                     "stem_width": 64},
    "maxvit_base": {"depths": (2, 6, 14, 2), "dims": (96, 192, 384, 768),
                    "stem_width": 64},
}


def maxvit_spec(model_kind: str) -> dict:
    m = re.search(r"(maxvit_[a-z]+)", model_kind)
    if not m or m.group(1) not in MAXVIT_CONFIGS:
        raise ValueError(f"Unknown MaxViT variant in model_kind: {model_kind}")
    return MAXVIT_CONFIGS[m.group(1)]


def get_model_image_size(model_kind: str) -> int:
    """Native input resolution parsed from the timm model string
    (reference architectures.py:10-22)."""
    if "maxvit" in model_kind.lower():
        # terminal resolution (``maxvit_tiny_rw_224``) or followed by a
        # timm variant suffix (``maxvit_tiny_rw_224.sw_in1k``) — same
        # pattern as interop.maxvit_convert.retarget_model_kind
        m = re.search(r"_(\d+)(?=\.|$)", model_kind)
        if m:
            return int(m.group(1))
    return 224


def _rel_position_index(win: int) -> np.ndarray:
    """Swin-style (win², win²) index into a (2·win−1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win),
                                  indexing="ij"))          # (2, w, w)
    coords = coords.reshape(2, -1)                          # (2, w²)
    rel = coords[:, :, None] - coords[:, None, :]           # (2, w², w²)
    rel = rel.transpose(1, 2, 0) + (win - 1)                # shift to ≥0
    return (rel[..., 0] * (2 * win - 1) + rel[..., 1]).astype(np.int32)


class RelPosAttention(nn.Module):
    """Multi-head self-attention with relative position bias over fixed-size
    square partitions.  Input: (B·num_windows, win², C)."""

    dim: int
    window: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_heads = self.dim // self.head_dim
        bn, n, _ = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bn, n, 3, num_heads, self.head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

        table = self.param(
            "rel_pos_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, num_heads),
        )
        index = _rel_position_index(self.window)
        bias = table[index.reshape(-1)].reshape(n, n, num_heads)
        bias = bias.transpose(2, 0, 1).astype(self.dtype)   # (heads, n, n)

        scale = self.head_dim ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None]
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bn, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TransformerMlp(nn.Module):
    dim: int
    expand: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.expand * self.dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·H/w·W/w, w², C): non-overlapping windows."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def grid_partition(x: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·H/g·W/g, g², C): dilated g×g grids (tokens strided
    by H/g, W/g across the full image)."""
    b, h, w, c = x.shape
    x = x.reshape(b, grid, h // grid, grid, w // grid, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, grid * grid, c)


def grid_reverse(x: jnp.ndarray, grid: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // grid, w // grid, grid, grid, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(-1, h, w, c)


class SqueezeExcite(nn.Module):
    mid_chs: int
    rd_chs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_chs, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(self.mid_chs, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    """Pre-norm MBConv with optional stride-2 downsample."""

    out_chs: int
    stride: int = 1
    expand: int = 4
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        mid_chs = in_chs * self.expand

        shortcut = x
        if self.stride == 2:
            shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2),
                                   padding="VALID")
        if self.stride == 2 or in_chs != self.out_chs:
            shortcut = nn.Conv(self.out_chs, (1, 1), dtype=self.dtype,
                               name="shortcut_conv")(shortcut)

        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        x = bn("pre_norm")(x)
        x = nn.Conv(mid_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1_1x1")(x)
        x = bn("norm1")(x)
        x = gelu_exact(x)
        # explicit symmetric padding: torch Conv2d(padding=1) semantics —
        # XLA "SAME" pads (0, 1) for stride 2 on even sizes, which shifts
        # sampling positions vs the timm checkpoints
        x = nn.Conv(mid_chs, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid_chs,
                    use_bias=False, dtype=self.dtype, name="conv2_dw")(x)
        x = bn("norm2")(x)
        x = gelu_exact(x)
        x = SqueezeExcite(mid_chs, max(1, int(in_chs * self.se_ratio)),
                          dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), dtype=self.dtype,
                    name="conv3_1x1")(x)
        return x + shortcut


class MaxViTBlock(nn.Module):
    dim: int
    stride: int
    window: int
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = MBConv(out_chs=self.dim, stride=self.stride, dtype=self.dtype,
                   name="mbconv")(x, train=train)
        _, h, w, _ = x.shape
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.norm_eps, dtype=self.dtype, name=name)

        # Window ("block") attention
        t = window_partition(x, self.window)
        t2 = RelPosAttention(self.dim, self.window, dtype=self.dtype,
                             name="attn_block")(ln("norm1_block")(t))
        t = t + t2
        t = t + TransformerMlp(self.dim, dtype=self.dtype,
                               name="mlp_block")(ln("norm2_block")(t))
        x = window_reverse(t, self.window, h, w)

        # Grid attention
        t = grid_partition(x, self.window)
        t2 = RelPosAttention(self.dim, self.window, dtype=self.dtype,
                             name="attn_grid")(ln("norm1_grid")(t))
        t = t + t2
        t = t + TransformerMlp(self.dim, dtype=self.dtype,
                               name="mlp_grid")(ln("norm2_grid")(t))
        return grid_reverse(t, self.window, h, w)


class MaxViTBackbone(nn.Module):
    """NHWC feature extractor: (N, S, S, 3) → (N, s, s, dims[-1])."""

    depths: Sequence[int] = (2, 2, 5, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    stem_width: int = 64
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # explicit (1,1) padding: torch Conv2d(3, s=2, padding=1) semantics
        x = nn.Conv(self.stem_width, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_norm1")(x)
        x = gelu_exact(x)
        x = nn.Conv(self.stem_width, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="stem_conv2")(x)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            for b in range(depth):
                x = MaxViTBlock(
                    dim=dim, stride=2 if b == 0 else 1, window=self.window,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x, train=train)
        return x


def _backbone_and_size(config, dtype):
    model_kind = config.get("model_kind", "maxvit_tiny_rw_224.sw_in1k")
    spec = maxvit_spec(model_kind)
    image_size = get_model_image_size(model_kind)
    # timm convention: partition size = input resolution / 32 (224 → 7), the
    # spatial size of the final stage, so every stage divides evenly.
    window = max(1, image_size // 32)
    backbone = MaxViTBackbone(
        depths=spec["depths"], dims=spec["dims"],
        stem_width=spec["stem_width"], window=window, dtype=dtype,
        name="backbone")
    return backbone, image_size


class MaxViTClassifier(nn.Module):
    """Image-only MaxViT (reference ``MaxViT``, architectures.py:25-51):
    resize → backbone → global pool → MLP head (GELU)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("MaxViT", image_input, metadata_input)
        backbone, size = _backbone_and_size(self.config, self.dtype)
        x = resize_bilinear(image_input, size)
        x = backbone(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return ImageHead(
            fc1=self.config["fc1_neurons"],
            fc2=self.config["fc2_neurons"],
            dropout=self.config["dropout"],
            activation="gelu",
            dtype=self.dtype,
            name="head",
        )(x, train=train)


class MmMaxViT(nn.Module):
    """Multi-modal MaxViT (reference ``mm_MaxViT``, architectures.py:54-101)."""

    config: dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_input=None, metadata_input=None,
                 train: bool = False) -> jnp.ndarray:
        check_inputs("mm_MaxViT", image_input, metadata_input)
        backbone, size = _backbone_and_size(self.config, self.dtype)
        x = resize_bilinear(image_input, size)
        x = backbone(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
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
