"""MaxViT torch checkpoint ↔ flax conversion.

Key naming follows timm's maxxvit module structure (stem.conv1/norm1/conv2;
stages.{s}.blocks.{b}.conv.* for the MBConv, .attn_block.* / .attn_grid.*
for the two attention sublayers with swin-style
``relative_position_bias_table``), wrapped under the reference model attrs
(``maxvit.`` for the image-only classifier with its Sequential head surgery,
``maxvit_backbone.`` for mm_MaxViT — reference architectures.py:25-101).

Exact-key parity against real timm `maxvit_tiny_rw_224` checkpoints cannot
be validated in this offline environment (timm is not installed); the
mapping is written to the documented naming and validated bidirectionally
against the in-repo torch oracle (tests/torch_maxvit_mirror.py).  A remap
hook (``key_aliases``) is provided so real-checkpoint deviations can be
patched without touching the structural mapping.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from ..core.config import Config
from ..models.maxvit import maxvit_spec
from .convert import _np, t_bn_stats, t_conv, t_linear, t_norm_affine


#: substring → substring key remaps applied before conversion, the patch
#: point for real-checkpoint naming drift (e.g. if a real timm rw checkpoint
#: names the MBConv shortcut differently:
#: ``{".shortcut.expand.": ".shortcut.conv."}``).  Aliases are applied as a
#: read-through view so strict conversion accounting still tracks the
#: original checkpoint keys.
KEY_ALIASES: dict[str, str] = {}


class _AliasedView(Mapping):
    """Mapping view exposing renamed keys while reads hit the base mapping
    (keeps convert.TrackedStateDict consumption accounting intact)."""

    def __init__(self, base: Mapping, aliases: Mapping[str, str]):
        self._base = base
        self._to_base = {}
        for key in base:
            renamed = key
            for old, new in aliases.items():
                renamed = renamed.replace(old, new)
            self._to_base[renamed] = key

    def __getitem__(self, key):
        return self._base[self._to_base[key]]

    def __contains__(self, key):
        return key in self._to_base

    def __iter__(self):
        return iter(self._to_base)

    def __len__(self):
        return len(self._to_base)


def apply_key_aliases(sd: Mapping, aliases: Mapping[str, str] | None = None):
    aliases = KEY_ALIASES if aliases is None else aliases
    return _AliasedView(sd, aliases) if aliases else sd


def _shortcut_conv(sd, prefix):
    """timm maxxvit's MBConv shortcut is a Downsample2d whose 1×1 conv attr
    may be named ``expand`` (pool+expand) — probe both namings."""
    for cand in (f"{prefix}.shortcut.conv", f"{prefix}.shortcut.expand"):
        if f"{cand}.weight" in sd:
            return t_conv(sd, cand)
    raise KeyError(f"{prefix}.shortcut.conv(.weight) / .shortcut.expand")


def _mbconv(sd, prefix, in_chs, out_chs, stride):
    params: dict[str, Any] = {
        "conv1_1x1": t_conv(sd, f"{prefix}.conv1_1x1"),
        "conv2_dw": t_conv(sd, f"{prefix}.conv2_kxk"),
        "conv3_1x1": t_conv(sd, f"{prefix}.conv3_1x1"),
        "se": {"fc1": t_conv(sd, f"{prefix}.se.fc1"),
               "fc2": t_conv(sd, f"{prefix}.se.fc2")},
        "pre_norm": t_norm_affine(sd, f"{prefix}.pre_norm"),
        "norm1": t_norm_affine(sd, f"{prefix}.norm1"),
        "norm2": t_norm_affine(sd, f"{prefix}.norm2"),
    }
    stats = {
        "pre_norm": t_bn_stats(sd, f"{prefix}.pre_norm"),
        "norm1": t_bn_stats(sd, f"{prefix}.norm1"),
        "norm2": t_bn_stats(sd, f"{prefix}.norm2"),
    }
    if stride == 2 or in_chs != out_chs:
        params["shortcut_conv"] = _shortcut_conv(sd, prefix)
    return params, stats


def resize_rel_pos_table(table: np.ndarray, target_window: int) -> np.ndarray:
    """Bilinear-resample a ((2w−1)², heads) relative-position bias table to
    a different window size (align-corners, so the bias at the extreme
    relative offsets is preserved).  This is the standard adaptation timm
    applies when loading a checkpoint at a non-native resolution — it makes
    e.g. ``maxvit_tiny_rw_160`` loadable from 224-trained checkpoints
    (every other parameter is resolution-independent; quality should be
    re-validated or fine-tuned at the new resolution)."""
    n, heads = table.shape
    src = int(round(np.sqrt(n)))
    dst = 2 * target_window - 1
    if src == dst:
        return table
    grid = table.reshape(src, src, heads).astype(np.float64)
    # align-corners sample positions
    pos = np.linspace(0.0, src - 1.0, dst) if dst > 1 else np.zeros(1)
    i0 = np.clip(np.floor(pos).astype(int), 0, src - 1)
    i1 = np.clip(i0 + 1, 0, src - 1)
    f_row = (pos - i0)[:, None, None]                  # (dst, 1, 1)
    rows = grid[i0] * (1 - f_row) + grid[i1] * f_row   # (dst, src, heads)
    f_col = (pos - i0)[None, :, None]                  # (1, dst, 1)
    cols = rows[:, i0] * (1 - f_col) + rows[:, i1] * f_col
    return cols.reshape(dst * dst, heads).astype(table.dtype)


def retarget_maxvit_variables(variables: Mapping,
                              target_model_kind: str) -> dict:
    """Retarget trained flax MaxViT variables to a different native
    resolution: every ``rel_pos_table`` leaf is bilinearly resampled to the
    target window (``resize_rel_pos_table``); all other parameters and
    batch stats are resolution-independent and pass through unchanged.

    This is the flax-run-dir counterpart of the timm-checkpoint path in
    ``maxvit_backbone_to_flax`` — e.g. a ``maxvit_tiny_rw_224``-trained
    run retargeted to ``maxvit_tiny_rw_160`` serves ~1.58× faster
    (docs/perf_sweep.json maxvit_resolution_study_r3).  Use with a model
    built from a config whose ``model_kind`` names the target resolution;
    quality should be re-validated at the new resolution
    (scripts/maxvit_retarget_study.py measures the trade on-chip)."""
    from ..models.maxvit import get_model_image_size

    target_window = max(1, get_model_image_size(target_model_kind) // 32)

    def walk(node):
        if isinstance(node, Mapping):
            return {k: (resize_rel_pos_table(np.asarray(v), target_window)
                        if k == "rel_pos_table" else walk(v))
                    for k, v in node.items()}
        return node

    return walk(variables)


def retarget_model_kind(model_kind: str, resolution: int) -> str:
    """Rewrite the native resolution embedded in a timm-style MaxViT model
    string: ``maxvit_tiny_rw_224.sw_in1k`` → ``maxvit_tiny_rw_160.sw_in1k``.
    Raises for non-MaxViT kinds (other families have no resolution axis) and
    for kinds that do not encode a resolution (nothing to rewrite)."""
    if "maxvit" not in model_kind.lower():
        raise ValueError(
            f"--retarget-resolution only applies to MaxViT model kinds, "
            f"got {model_kind!r}")
    # resolution segment may be terminal (``maxvit_tiny_rw_224``) or
    # followed by a timm variant suffix (``maxvit_tiny_rw_224.sw_in1k``)
    new, n = re.subn(r"_(\d+)(?=\.|$)", f"_{resolution}", model_kind, count=1)
    if n == 0:
        raise ValueError(
            f"model kind {model_kind!r} does not encode a native resolution "
            "(expected a timm-style '_<res>' segment)")
    return new


def _attention(sd, prefix, our_suffix, target_window=None):
    table = _np(
        sd[f"{prefix}.attn.rel_pos.relative_position_bias_table"]).copy()
    if target_window is not None:
        table = resize_rel_pos_table(table, target_window)
    return {
        f"norm1_{our_suffix}": t_norm_affine(sd, f"{prefix}.norm1"),
        f"attn_{our_suffix}": {
            "qkv": t_linear(sd, f"{prefix}.attn.qkv"),
            "proj": t_linear(sd, f"{prefix}.attn.proj"),
            "rel_pos_table": table,
        },
        f"norm2_{our_suffix}": t_norm_affine(sd, f"{prefix}.norm2"),
        f"mlp_{our_suffix}": {
            "fc1": t_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": t_linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def maxvit_backbone_to_flax(sd: Mapping, prefix: str, model_kind: str):
    """(params, batch_stats) for a MaxViTBackbone from timm-named keys.

    When model_kind names a non-native resolution (e.g.
    ``maxvit_tiny_rw_160`` loaded from a 224 checkpoint), the
    relative-position bias tables are bilinearly resampled to the target
    window (``resize_rel_pos_table``); everything else is
    resolution-independent."""
    from ..models.maxvit import get_model_image_size

    spec = maxvit_spec(model_kind)
    target_window = max(1, get_model_image_size(model_kind) // 32)
    p = f"{prefix}." if prefix else ""
    params: dict[str, Any] = {
        "stem_conv1": t_conv(sd, f"{p}stem.conv1"),
        "stem_norm1": t_norm_affine(sd, f"{p}stem.norm1"),
        "stem_conv2": t_conv(sd, f"{p}stem.conv2"),
    }
    stats: dict[str, Any] = {
        "stem_norm1": t_bn_stats(sd, f"{p}stem.norm1"),
    }
    in_chs = spec["stem_width"]
    for s, (depth, dim) in enumerate(zip(spec["depths"], spec["dims"])):
        for b in range(depth):
            stride = 2 if b == 0 else 1
            bp = f"{p}stages.{s}.blocks.{b}"
            block_params: dict[str, Any] = {}
            block_stats: dict[str, Any] = {}
            mb_params, mb_stats = _mbconv(sd, f"{bp}.conv", in_chs, dim,
                                          stride)
            block_params["mbconv"] = mb_params
            block_stats["mbconv"] = mb_stats
            block_params.update(_attention(sd, f"{bp}.attn_block", "block",
                                           target_window))
            block_params.update(_attention(sd, f"{bp}.attn_grid", "grid",
                                           target_window))
            params[f"stage{s}_block{b}"] = block_params
            stats[f"stage{s}_block{b}"] = block_stats
            in_chs = dim
    return params, stats


def convert_maxvit(config: Config, sd: Mapping) -> dict:
    """Image-only MaxViT (reference head Sequential: 1=fc1, 3=fc2, 6=out)."""
    model_kind = config.get("model_kind", "maxvit_tiny_rw_224.sw_in1k")
    sd = apply_key_aliases(sd)
    b_params, b_stats = maxvit_backbone_to_flax(sd, "maxvit", model_kind)
    params = {
        "backbone": b_params,
        "head": {
            "fc1": t_linear(sd, "maxvit.head.1"),
            "fc2": t_linear(sd, "maxvit.head.3"),
            "out": t_linear(sd, "maxvit.head.6"),
        },
    }
    return {"params": params, "batch_stats": {"backbone": b_stats}}


def convert_mm_maxvit(config: Config, sd: Mapping) -> dict:
    from .convert import _metadata_branch

    model_kind = config.get("model_kind", "maxvit_tiny_rw_224.sw_in1k")
    sd = apply_key_aliases(sd)
    b_params, b_stats = maxvit_backbone_to_flax(
        sd, "maxvit_backbone", model_kind)
    meta_params, meta_stats = _metadata_branch(sd, "metadata_branch")
    params = {
        "backbone": b_params,
        "metadata_branch": meta_params,
        "combined_head": {
            "fc1": t_linear(sd, "combined_head.0"),
            "fc2": t_linear(sd, "combined_head.2"),
            "out": t_linear(sd, "combined_head.5"),
        },
    }
    return {"params": params,
            "batch_stats": {"backbone": b_stats,
                            "metadata_branch": meta_stats}}


# -------------------------- export (flax → torch) -------------------------

def _inv_mbconv(sd, prefix, params, stats):
    from .export import inv_bn, inv_conv

    inv_bn(sd, f"{prefix}.pre_norm", params["pre_norm"], stats["pre_norm"])
    inv_conv(sd, f"{prefix}.conv1_1x1", params["conv1_1x1"])
    inv_bn(sd, f"{prefix}.norm1", params["norm1"], stats["norm1"])
    inv_conv(sd, f"{prefix}.conv2_kxk", params["conv2_dw"])
    inv_bn(sd, f"{prefix}.norm2", params["norm2"], stats["norm2"])
    inv_conv(sd, f"{prefix}.se.fc1", params["se"]["fc1"])
    inv_conv(sd, f"{prefix}.se.fc2", params["se"]["fc2"])
    inv_conv(sd, f"{prefix}.conv3_1x1", params["conv3_1x1"])
    if "shortcut_conv" in params:
        inv_conv(sd, f"{prefix}.shortcut.conv", params["shortcut_conv"])


def _inv_attention(sd, prefix, block_params, suffix):
    from .export import inv_linear, inv_norm

    inv_norm(sd, f"{prefix}.norm1", block_params[f"norm1_{suffix}"])
    attn = block_params[f"attn_{suffix}"]
    inv_linear(sd, f"{prefix}.attn.qkv", attn["qkv"])
    inv_linear(sd, f"{prefix}.attn.proj", attn["proj"])
    sd[f"{prefix}.attn.rel_pos.relative_position_bias_table"] = \
        np.asarray(attn["rel_pos_table"]).copy()
    inv_norm(sd, f"{prefix}.norm2", block_params[f"norm2_{suffix}"])
    mlp = block_params[f"mlp_{suffix}"]
    inv_linear(sd, f"{prefix}.mlp.fc1", mlp["fc1"])
    inv_linear(sd, f"{prefix}.mlp.fc2", mlp["fc2"])


def maxvit_backbone_to_torch(sd: dict, prefix: str, params, stats,
                             model_kind: str) -> None:
    from .export import inv_bn, inv_conv

    spec = maxvit_spec(model_kind)
    p = f"{prefix}." if prefix else ""
    inv_conv(sd, f"{p}stem.conv1", params["stem_conv1"])
    inv_bn(sd, f"{p}stem.norm1", params["stem_norm1"], stats["stem_norm1"])
    inv_conv(sd, f"{p}stem.conv2", params["stem_conv2"])
    for s, depth in enumerate(spec["depths"]):
        for b in range(depth):
            bp = f"{p}stages.{s}.blocks.{b}"
            block = params[f"stage{s}_block{b}"]
            bstats = stats[f"stage{s}_block{b}"]
            _inv_mbconv(sd, f"{bp}.conv", block["mbconv"],
                        bstats["mbconv"])
            _inv_attention(sd, f"{bp}.attn_block", block, "block")
            _inv_attention(sd, f"{bp}.attn_grid", block, "grid")


def export_maxvit(config: Config, variables: Mapping) -> dict:
    from .export import inv_linear

    model_kind = config.get("model_kind", "maxvit_tiny_rw_224.sw_in1k")
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: dict[str, Any] = {}
    maxvit_backbone_to_torch(sd, "maxvit", p["backbone"], s["backbone"],
                             model_kind)
    inv_linear(sd, "maxvit.head.1", p["head"]["fc1"])
    inv_linear(sd, "maxvit.head.3", p["head"]["fc2"])
    inv_linear(sd, "maxvit.head.6", p["head"]["out"])
    return sd


def export_mm_maxvit(config: Config, variables: Mapping) -> dict:
    from .export import _export_metadata_branch, inv_linear

    model_kind = config.get("model_kind", "maxvit_tiny_rw_224.sw_in1k")
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: dict[str, Any] = {}
    maxvit_backbone_to_torch(sd, "maxvit_backbone", p["backbone"],
                             s["backbone"], model_kind)
    _export_metadata_branch(sd, "metadata_branch", p["metadata_branch"],
                            s["metadata_branch"])
    inv_linear(sd, "combined_head.0", p["combined_head"]["fc1"])
    inv_linear(sd, "combined_head.2", p["combined_head"]["fc2"])
    inv_linear(sd, "combined_head.5", p["combined_head"]["out"])
    return sd
