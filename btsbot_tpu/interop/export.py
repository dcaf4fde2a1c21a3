"""JAX param tree → torch state dict export (the reverse of convert.py).

This powers the deployment/publishing story the reference implements with
``to_HF.prep_model`` and ``to_onnx`` (`/root/reference/btsbot/to_HF.py:27-43`,
`to_onnx.py`): models trained with btsbot-tpu are exported as
reference-named torch state dicts (``pytorch_model.bin``), which existing
brokers can load with the original package (and convert onward to ONNX with
its exporter).  Layout transforms are the exact inverses of convert.py:
Linear kernels transposed back, conv kernels back to (O, I, kh, kw), the
first post-flatten Dense re-permuted to NCHW order, BatchNorm stats
reattached as running_mean/running_var (+ a zero num_batches_tracked, which
torch checkpoints carry).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..core.config import Config, normalize_config
from ..models.convnext import convnext_spec
from .convert import _head_perm, nchw_flatten_perm


def _np(x) -> np.ndarray:
    return np.asarray(x)


def inv_linear(sd: dict, prefix: str, leaf: Mapping,
               in_perm: np.ndarray | None = None) -> None:
    w = _np(leaf["kernel"]).T  # (out, in)
    if in_perm is not None:
        inv = np.empty_like(in_perm)
        inv[in_perm] = np.arange(in_perm.size)
        w = w[:, inv]
    sd[f"{prefix}.weight"] = w.copy()
    sd[f"{prefix}.bias"] = _np(leaf["bias"]).copy()


def inv_conv(sd: dict, prefix: str, leaf: Mapping) -> None:
    sd[f"{prefix}.weight"] = np.transpose(
        _np(leaf["kernel"]), (3, 2, 0, 1)).copy()
    if "bias" in leaf:
        sd[f"{prefix}.bias"] = _np(leaf["bias"]).copy()


def inv_norm(sd: dict, prefix: str, leaf: Mapping) -> None:
    sd[f"{prefix}.weight"] = _np(leaf["scale"]).copy()
    sd[f"{prefix}.bias"] = _np(leaf["bias"]).copy()


def inv_bn(sd: dict, prefix: str, params: Mapping, stats: Mapping) -> None:
    inv_norm(sd, prefix, params)
    sd[f"{prefix}.running_mean"] = _np(stats["mean"]).copy()
    sd[f"{prefix}.running_var"] = _np(stats["var"]).copy()
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _export_cnn_backbone(sd: dict, params: Mapping) -> None:
    inv_conv(sd, "conv_layers.0", params["conv1a"])
    inv_conv(sd, "conv_layers.2", params["conv1b"])
    inv_conv(sd, "conv_layers.6", params["conv2a"])
    inv_conv(sd, "conv_layers.8", params["conv2b"])


def _export_metadata_branch(sd: dict, prefix: str, params: Mapping,
                            stats: Mapping) -> None:
    inv_bn(sd, f"{prefix}.0", params["bn"], stats["bn"])
    inv_linear(sd, f"{prefix}.1", params["fc1"])
    inv_linear(sd, f"{prefix}.4", params["fc2"])


def _export_mm_cnn(config: Config, variables: Mapping) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: dict[str, Any] = {}
    _export_cnn_backbone(sd, p["backbone"])
    _export_metadata_branch(sd, "metadata_branch", p["metadata_branch"],
                            s["metadata_branch"])
    fc1_in = _np(p["combined_head"]["fc1"]["kernel"]).shape[0]
    inv_linear(sd, "combined_head.0", p["combined_head"]["fc1"],
               in_perm=_head_perm(config, fc1_in))
    inv_linear(sd, "combined_head.2", p["combined_head"]["fc2"])
    inv_linear(sd, "combined_head.5", p["combined_head"]["out"])
    return sd


def _export_um_cnn(config: Config, variables: Mapping) -> dict:
    p = variables["params"]
    sd: dict[str, Any] = {}
    _export_cnn_backbone(sd, p["backbone"])
    fc1_in = _np(p["head"]["fc1"]["kernel"]).shape[0]
    inv_linear(sd, "head.0", p["head"]["fc1"],
               in_perm=_head_perm(config, fc1_in))
    inv_linear(sd, "head.2", p["head"]["fc2"])
    inv_linear(sd, "head.5", p["head"]["out"])
    return sd


def _export_um_nn(config: Config, variables: Mapping) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: dict[str, Any] = {}
    inv_bn(sd, "network.0", p["branch"]["bn"], s["branch"]["bn"])
    inv_linear(sd, "network.1", p["branch"]["fc1"])
    inv_linear(sd, "network.4", p["branch"]["fc2"])
    inv_linear(sd, "network.6", p["out"])
    return sd


def _export_convnext_backbone(sd: dict, prefix: str, params: Mapping,
                              model_kind: str) -> None:
    spec = convnext_spec(model_kind)
    pfx = f"{prefix}." if prefix else ""
    inv_conv(sd, f"{pfx}stem.0", params["stem_conv"])
    inv_norm(sd, f"{pfx}stem.1", params["stem_norm"])
    for si, depth in enumerate(spec["depths"]):
        stage = params[f"stage{si}"]
        if si > 0:
            inv_norm(sd, f"{pfx}stages.{si}.downsample.0",
                     stage["downsample_norm"])
            inv_conv(sd, f"{pfx}stages.{si}.downsample.1",
                     stage["downsample_conv"])
        for b in range(depth):
            block = stage[f"block{b}"]
            bp = f"{pfx}stages.{si}.blocks.{b}"
            if "mixer" in block:  # TPU-native inceptionnext_* kinds
                for leaf in ("dw_square", "dw_band_w", "dw_band_h"):
                    inv_conv(sd, f"{bp}.mixer.{leaf}", block["mixer"][leaf])
            else:
                inv_conv(sd, f"{bp}.conv_dw", block["conv_dw"])
            inv_norm(sd, f"{bp}.norm", block["norm"])
            inv_linear(sd, f"{bp}.mlp.fc1", block["mlp_fc1"])
            inv_linear(sd, f"{bp}.mlp.fc2", block["mlp_fc2"])
            if "gamma" in block:
                sd[f"{bp}.gamma"] = _np(block["gamma"]).copy()


def _export_convnext(config: Config, variables: Mapping) -> dict:
    p = variables["params"]
    model_kind = config.get("model_kind", "convnext_nano.d1h_in1k")
    sd: dict[str, Any] = {}
    _export_convnext_backbone(sd, "convnext", p["backbone"], model_kind)
    inv_norm(sd, "convnext.head.1", p["head_norm"])
    inv_linear(sd, "convnext.head.3", p["head"]["fc1"])
    inv_linear(sd, "convnext.head.5", p["head"]["fc2"])
    inv_linear(sd, "convnext.head.8", p["head"]["out"])
    return sd


def _export_mm_convnext(config: Config, variables: Mapping) -> dict:
    p = variables["params"]
    s = variables.get("batch_stats", {})
    model_kind = config.get("model_kind", "convnext_nano.d1h_in1k")
    sd: dict[str, Any] = {}
    _export_convnext_backbone(sd, "convnext_backbone", p["backbone"],
                              model_kind)
    if "head_norm" in p:
        inv_norm(sd, "convnext_backbone.head.1", p["head_norm"])
    _export_metadata_branch(sd, "metadata_branch", p["metadata_branch"],
                            s["metadata_branch"])
    inv_linear(sd, "combined_head.0", p["combined_head"]["fc1"])
    inv_linear(sd, "combined_head.2", p["combined_head"]["fc2"])
    inv_linear(sd, "combined_head.5", p["combined_head"]["out"])
    return sd


def _export_frozen_fusion(config: Config, variables: Mapping) -> dict:
    """Inverse of convert._convert_frozen_fusion (branch modules under
    image_branch./meta_branch. with the reference's head stripping)."""
    from ..core.config import normalize_config as _norm
    from ..models.fusion import resolve_fusion_config

    cfg = resolve_fusion_config(dict(config))
    img_cfg = _norm(cfg["image_model_config"])
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: dict[str, Any] = {}

    img_name = img_cfg["model_name"]
    img = p["image_branch"]
    if img_name == "um_cnn":
        inv_conv(sd, "image_branch.conv_layers.0", img["backbone"]["conv1a"])
        inv_conv(sd, "image_branch.conv_layers.2", img["backbone"]["conv1b"])
        inv_conv(sd, "image_branch.conv_layers.6", img["backbone"]["conv2a"])
        inv_conv(sd, "image_branch.conv_layers.8", img["backbone"]["conv2b"])
    elif img_name == "ConvNeXt":
        _export_convnext_backbone(
            sd, "image_branch.convnext", img["backbone"],
            img_cfg.get("model_kind", "convnext_nano.d1h_in1k"))
        inv_norm(sd, "image_branch.convnext.head.1", img["head_norm"])
    elif img_name == "MaxViT":
        from .maxvit_convert import maxvit_backbone_to_torch
        maxvit_backbone_to_torch(
            sd, "image_branch.maxvit", img["backbone"],
            s["image_branch"]["backbone"],
            img_cfg.get("model_kind", "maxvit_tiny_rw_224.sw_in1k"))
    else:
        raise NotImplementedError(
            f"frozen_fusion image branch {img_name} has no exporter")

    inv_bn(sd, "meta_branch.network.0", p["meta_branch"]["bn"],
           s["meta_branch"]["bn"])
    inv_linear(sd, "meta_branch.network.1", p["meta_branch"]["fc1"])
    inv_linear(sd, "meta_branch.network.4", p["meta_branch"]["fc2"])

    fc1_in = _np(p["combined_head"]["fc1"]["kernel"]).shape[0]
    in_perm = _head_perm(img_cfg, fc1_in) if img_name == "um_cnn" else None
    inv_linear(sd, "combined_head.0", p["combined_head"]["fc1"],
               in_perm=in_perm)
    inv_linear(sd, "combined_head.2", p["combined_head"]["fc2"])
    inv_linear(sd, "combined_head.5", p["combined_head"]["out"])
    return sd


def _export_maxvit(config, variables):
    from .maxvit_convert import export_maxvit
    return export_maxvit(config, variables)


def _export_mm_maxvit(config, variables):
    from .maxvit_convert import export_mm_maxvit
    return export_mm_maxvit(config, variables)


_EXPORTERS = {
    "mm_cnn": _export_mm_cnn,
    "um_cnn": _export_um_cnn,
    "um_nn": _export_um_nn,
    "ConvNeXt": _export_convnext,
    "mm_ConvNeXt": _export_mm_convnext,
    "MaxViT": _export_maxvit,
    "mm_MaxViT": _export_mm_maxvit,
    "frozen_fusion": _export_frozen_fusion,
}


def variables_to_torch_state_dict(config, variables: Mapping) -> dict:
    """Flax variables → reference-named numpy state dict."""
    if not isinstance(config, Config):
        config = normalize_config(config)
    name = config["model_name"]
    try:
        exporter = _EXPORTERS[name]
    except KeyError:
        raise NotImplementedError(
            f"No torch exporter for model {name}") from None
    return exporter(config, variables)


def save_torch_checkpoint(path: str, config, variables: Mapping) -> None:
    """Write a ``pytorch_model.bin``-style checkpoint loadable by torch."""
    import torch

    sd = variables_to_torch_state_dict(config, variables)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
