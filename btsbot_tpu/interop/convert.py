"""torch/timm checkpoint → JAX param-tree conversion (bit-exact).

The reference distributes trained models as torch state dicts
(``best_model.pth`` / ``pytorch_model.bin`` — from_HF.py:74-79,
to_HF.py:27-43), with layers registered inside ``nn.Sequential`` containers,
so keys are positional (e.g. ``conv_layers.0.weight``,
``combined_head.5.bias`` — architectures.py:180-222).  This module maps those
keys onto btsbot-tpu's named flax trees with the layout changes a
NCHW-torch → NHWC-JAX move requires:

* Linear: torch (out, in) → flax kernel (in, out)  [transpose];
* Conv2d: torch (O, I, kh, kw) → flax (kh, kw, I, O); depthwise convs keep
  the same transform ((O, 1, kh, kw) → (kh, kw, 1, O));
* BatchNorm1d: weight/bias → params scale/bias; running stats → batch_stats;
* the first Dense consuming a flattened NCHW feature map has its input axis
  permuted from (C, H, W) order to our NHWC (H, W, C) flatten order (affects
  mm_cnn/um_cnn heads — reference architectures.py:200-202 flattens NCHW).

Accepts dicts of torch tensors or numpy arrays; "module."-prefixed
DataParallel checkpoints are normalized first (reference to_onnx.py:32-34).
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping

import numpy as np

from ..core.config import Config, normalize_config
from ..models.convnext import convnext_spec


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


#: torch bookkeeping keys a conversion legitimately never reads.
IGNORED_KEY_SUFFIXES = (".num_batches_tracked",)


def _is_bookkeeping(key: str) -> bool:
    return key.endswith(IGNORED_KEY_SUFFIXES) or key.startswith("_")


class UnconsumedKeysError(KeyError):
    """A checkpoint carried keys the converter never read.

    The reference loads state dicts with ``load_state_dict(strict=True)``
    (from_HF.py:79), which errors on *both* missing and unexpected keys.
    Missing keys already raise KeyError here; this error restores the
    unexpected-key half of that contract so a real checkpoint with
    extra/renamed submodules (e.g. timm "rw"-variant extras) can never
    silently half-load.
    """

    def __init__(self, unconsumed: list[str], total: int):
        self.unconsumed = unconsumed
        self.total = total
        shown = ", ".join(unconsumed[:12])
        more = f" (+{len(unconsumed) - 12} more)" if len(unconsumed) > 12 else ""
        super().__init__(
            f"{len(unconsumed)}/{total} checkpoint keys were not consumed by "
            f"the conversion: {shown}{more}. The checkpoint layout does not "
            f"match this model; pass strict=False to half-load anyway, or "
            f"remap the offending keys (interop.maxvit_convert key_aliases / "
            f"interop.pretrained strip rules).")


class TrackedStateDict(Mapping):
    """Read-tracking view of a state dict for strict conversion accounting.

    Records every key read via ``[]``; containment checks (``in``) do not
    count as consumption, so optional-key probes stay side-effect free.
    """

    def __init__(self, data: Mapping[str, Any]):
        self._data = dict(data)
        self.consumed: set[str] = set()

    def __getitem__(self, key: str):
        value = self._data[key]
        self.consumed.add(key)
        return value

    def __contains__(self, key) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)


def strip_module_prefix(sd: Mapping[str, Any]) -> dict[str, Any]:
    if sd and next(iter(sd)).startswith("module."):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


def t_linear(sd, prefix: str, in_perm: np.ndarray | None = None) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # (out, in)
    if in_perm is not None:
        w = w[:, in_perm]
    return {"kernel": w.T.copy(), "bias": _np(sd[f"{prefix}.bias"]).copy()}


def t_conv(sd, prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # (O, I/groups, kh, kw)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0)).copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).copy()
    return out


def t_norm_affine(sd, prefix: str) -> dict:
    """LayerNorm / BatchNorm affine params."""
    return {"scale": _np(sd[f"{prefix}.weight"]).copy(),
            "bias": _np(sd[f"{prefix}.bias"]).copy()}


def t_bn_stats(sd, prefix: str) -> dict:
    return {"mean": _np(sd[f"{prefix}.running_mean"]).copy(),
            "var": _np(sd[f"{prefix}.running_var"]).copy()}


def nchw_flatten_perm(c: int, h: int, w: int) -> np.ndarray:
    """Permutation p with p[nhwc_index] = nchw_index, for re-indexing the
    input axis of a Linear that consumed a flattened NCHW map."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # value = torch flat index
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # ordered by (h, w, c)


def _head_perm(config: Config, total_in: int) -> np.ndarray | None:
    """Input-axis permutation for the first Dense after the CNN flatten
    (identity on any concatenated metadata columns)."""
    c = config["conv2_channels"]
    s = config.get("image_size", 63) // 8
    perm = nchw_flatten_perm(c, s, s)
    if total_in > perm.size:  # concat with metadata features
        perm = np.concatenate([perm, np.arange(perm.size, total_in)])
    return perm


def _cnn_backbone_params(sd) -> dict:
    return {
        "conv1a": t_conv(sd, "conv_layers.0"),
        "conv1b": t_conv(sd, "conv_layers.2"),
        "conv2a": t_conv(sd, "conv_layers.6"),
        "conv2b": t_conv(sd, "conv_layers.8"),
    }


def _metadata_branch(sd, prefix: str) -> tuple[dict, dict]:
    params = {
        "bn": t_norm_affine(sd, f"{prefix}.0"),
        "fc1": t_linear(sd, f"{prefix}.1"),
        "fc2": t_linear(sd, f"{prefix}.4"),
    }
    stats = {"bn": t_bn_stats(sd, f"{prefix}.0")}
    return params, stats


def _convert_mm_cnn(config: Config, sd) -> dict:
    meta_params, meta_stats = _metadata_branch(sd, "metadata_branch")
    fc1_in = _np(sd["combined_head.0.weight"]).shape[1]
    params = {
        "backbone": _cnn_backbone_params(sd),
        "metadata_branch": meta_params,
        "combined_head": {
            "fc1": t_linear(sd, "combined_head.0",
                            in_perm=_head_perm(config, fc1_in)),
            "fc2": t_linear(sd, "combined_head.2"),
            "out": t_linear(sd, "combined_head.5"),
        },
    }
    return {"params": params,
            "batch_stats": {"metadata_branch": meta_stats}}


def _convert_um_cnn(config: Config, sd) -> dict:
    fc1_in = _np(sd["head.0.weight"]).shape[1]
    params = {
        "backbone": _cnn_backbone_params(sd),
        "head": {
            "fc1": t_linear(sd, "head.0", in_perm=_head_perm(config, fc1_in)),
            "fc2": t_linear(sd, "head.2"),
            "out": t_linear(sd, "head.5"),
        },
    }
    return {"params": params, "batch_stats": {}}


def _convert_um_nn(config: Config, sd) -> dict:
    params = {
        "branch": {
            "bn": t_norm_affine(sd, "network.0"),
            "fc1": t_linear(sd, "network.1"),
            "fc2": t_linear(sd, "network.4"),
        },
        "out": t_linear(sd, "network.6"),
    }
    return {"params": params,
            "batch_stats": {"branch": {"bn": t_bn_stats(sd, "network.0")}}}


def _convnext_backbone_params(sd, prefix: str, model_kind: str) -> dict:
    """timm ConvNeXt naming: stem.{0,1}, stages.{s}.downsample.{0,1},
    stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}."""
    spec = convnext_spec(model_kind)
    inception = spec.get("token_mixer", "dwconv7") == "inception"
    p = f"{prefix}." if prefix else ""
    out: dict[str, Any] = {
        "stem_conv": t_conv(sd, f"{p}stem.0"),
        "stem_norm": t_norm_affine(sd, f"{p}stem.1"),
    }
    for s, depth in enumerate(spec["depths"]):
        stage: dict[str, Any] = {}
        if s > 0:
            stage["downsample_norm"] = t_norm_affine(
                sd, f"{p}stages.{s}.downsample.0")
            stage["downsample_conv"] = t_conv(sd, f"{p}stages.{s}.downsample.1")
        for b in range(depth):
            bp = f"{p}stages.{s}.blocks.{b}"
            block: dict[str, Any] = {
                "norm": t_norm_affine(sd, f"{bp}.norm"),
                "mlp_fc1": t_linear(sd, f"{bp}.mlp.fc1"),
                "mlp_fc2": t_linear(sd, f"{bp}.mlp.fc2"),
            }
            if inception:
                # TPU-native inceptionnext_* kinds (models/convnext.py
                # InceptionMixer): our own key naming, no timm counterpart
                block["mixer"] = {
                    "dw_square": t_conv(sd, f"{bp}.mixer.dw_square"),
                    "dw_band_w": t_conv(sd, f"{bp}.mixer.dw_band_w"),
                    "dw_band_h": t_conv(sd, f"{bp}.mixer.dw_band_h"),
                }
            else:
                block["conv_dw"] = t_conv(sd, f"{bp}.conv_dw")
            if f"{bp}.gamma" in sd:
                block["gamma"] = _np(sd[f"{bp}.gamma"]).copy()
            stage[f"block{b}"] = block
        out[f"stage{s}"] = stage
    return out


def _convert_convnext(config: Config, sd) -> dict:
    model_kind = config.get("model_kind", "convnext_nano.d1h_in1k")
    params = {
        "backbone": _convnext_backbone_params(sd, "convnext", model_kind),
        # reference head Sequential: 0 pool, 1 norm, 2 flatten, 3 fc1,
        # 5 fc2, 8 out (architectures.py:109-119)
        "head_norm": t_norm_affine(sd, "convnext.head.1"),
        "head": {
            "fc1": t_linear(sd, "convnext.head.3"),
            "fc2": t_linear(sd, "convnext.head.5"),
            "out": t_linear(sd, "convnext.head.8"),
        },
    }
    return {"params": params, "batch_stats": {}}


def _convert_mm_convnext(config: Config, sd) -> dict:
    model_kind = config.get("model_kind", "convnext_nano.d1h_in1k")
    meta_params, meta_stats = _metadata_branch(sd, "metadata_branch")
    params: dict[str, Any] = {
        "backbone": _convnext_backbone_params(
            sd, "convnext_backbone", model_kind),
        "metadata_branch": meta_params,
        "combined_head": {
            "fc1": t_linear(sd, "combined_head.0"),
            "fc2": t_linear(sd, "combined_head.2"),
            "out": t_linear(sd, "combined_head.5"),
        },
    }
    if "LS" in config.get("train_data_version", ""):
        # pool+norm+flatten head variant keeps the backbone's head norm
        # (architectures.py:137-141)
        params["head_norm"] = t_norm_affine(sd, "convnext_backbone.head.1")
    return {"params": params,
            "batch_stats": {"metadata_branch": meta_stats}}


def _convert_frozen_fusion(config: Config, sd) -> dict:
    """frozen_fusion checkpoints: branch modules keep their standalone attr
    names under ``image_branch.`` / ``meta_branch.`` prefixes, heads
    stripped per architectures.py:297-320 (um_cnn head→Identity, ConvNeXt
    keeps head.1 norm, MaxViT keeps pool only, um_nn drops trailing
    ReLU+Linear), plus a fresh ``combined_head`` (architectures.py:359-367).
    """
    from ..models.fusion import resolve_fusion_config

    cfg = resolve_fusion_config(dict(config))
    img_cfg = normalize_config(cfg["image_model_config"])
    meta_cfg = normalize_config(cfg["meta_model_config"])
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    img_name = img_cfg["model_name"]
    if img_name == "um_cnn":
        params["image_branch"] = {"backbone": {
            "conv1a": t_conv(sd, "image_branch.conv_layers.0"),
            "conv1b": t_conv(sd, "image_branch.conv_layers.2"),
            "conv2a": t_conv(sd, "image_branch.conv_layers.6"),
            "conv2b": t_conv(sd, "image_branch.conv_layers.8"),
        }}
    elif img_name == "ConvNeXt":
        params["image_branch"] = {
            "backbone": _convnext_backbone_params(
                sd, "image_branch.convnext",
                img_cfg.get("model_kind", "convnext_nano.d1h_in1k")),
            "head_norm": t_norm_affine(sd, "image_branch.convnext.head.1"),
        }
    elif img_name == "MaxViT":
        from .maxvit_convert import apply_key_aliases, maxvit_backbone_to_flax
        b_params, b_stats = maxvit_backbone_to_flax(
            apply_key_aliases(sd), "image_branch.maxvit",
            img_cfg.get("model_kind", "maxvit_tiny_rw_224.sw_in1k"))
        params["image_branch"] = {"backbone": b_params}
        stats["image_branch"] = {"backbone": b_stats}
    else:
        raise NotImplementedError(
            f"frozen_fusion image branch {img_name} has no converter")

    params["meta_branch"] = {
        "bn": t_norm_affine(sd, "meta_branch.network.0"),
        "fc1": t_linear(sd, "meta_branch.network.1"),
        "fc2": t_linear(sd, "meta_branch.network.4"),
    }
    stats["meta_branch"] = {"bn": t_bn_stats(sd, "meta_branch.network.0")}

    # um_cnn branch features are an NCHW flatten in the reference (head →
    # Identity after the conv stack) — re-permute combined_head.0's input
    fc1_in = _np(sd["combined_head.0.weight"]).shape[1]
    in_perm = _head_perm(img_cfg, fc1_in) if img_name == "um_cnn" else None
    params["combined_head"] = {
        "fc1": t_linear(sd, "combined_head.0", in_perm=in_perm),
        "fc2": t_linear(sd, "combined_head.2"),
        "out": t_linear(sd, "combined_head.5"),
    }
    return {"params": params, "batch_stats": stats}


def _convert_maxvit(config, sd):
    from .maxvit_convert import convert_maxvit
    return convert_maxvit(config, sd)


def _convert_mm_maxvit(config, sd):
    from .maxvit_convert import convert_mm_maxvit
    return convert_mm_maxvit(config, sd)


_CONVERTERS = {
    "mm_cnn": _convert_mm_cnn,
    "um_cnn": _convert_um_cnn,
    "um_nn": _convert_um_nn,
    "ConvNeXt": _convert_convnext,
    "mm_ConvNeXt": _convert_mm_convnext,
    "MaxViT": _convert_maxvit,
    "mm_MaxViT": _convert_mm_maxvit,
    "frozen_fusion": _convert_frozen_fusion,
}


def torch_state_dict_to_variables(config, state_dict: Mapping[str, Any],
                                  strict: bool = True) -> dict:
    """Convert a reference-model torch state dict into flax variables
    ({'params': ..., 'batch_stats': ...}) for the matching btsbot-tpu model.

    strict=True (default) raises :class:`UnconsumedKeysError` when the
    checkpoint carries keys the conversion never read (torch
    ``num_batches_tracked`` bookkeeping excepted) — the analog of
    ``load_state_dict(strict=True)``'s unexpected-key check (from_HF.py:79).
    Missing keys always raise KeyError regardless of ``strict``.
    """
    if not isinstance(config, Config):
        config = normalize_config(config)
    sd = strip_module_prefix(state_dict)
    name = config["model_name"]
    try:
        converter = _CONVERTERS[name]
    except KeyError:
        raise NotImplementedError(
            f"No torch converter for model {name}") from None
    tracked = TrackedStateDict(sd)
    variables = converter(config, tracked)
    if strict:
        unconsumed = sorted(k for k in sd
                            if k not in tracked.consumed
                            and not _is_bookkeeping(k))
        if unconsumed:
            raise UnconsumedKeysError(unconsumed, len(sd))
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    return variables


def conversion_manifest(config, state_dict: Mapping[str, Any]) -> dict:
    """Dry-run accounting report for a checkpoint conversion.

    Returns ``{"consumed": [...], "ignored": [...], "unconsumed": [...]}``
    without raising, so callers can inspect exactly which checkpoint keys a
    conversion would read before committing to it.
    """
    if not isinstance(config, Config):
        config = normalize_config(config)
    sd = strip_module_prefix(state_dict)
    tracked = TrackedStateDict(sd)
    _CONVERTERS[config["model_name"]](config, tracked)
    ignored = sorted(k for k in sd if _is_bookkeeping(k))
    unconsumed = sorted(k for k in sd
                        if k not in tracked.consumed
                        and not _is_bookkeeping(k))
    return {"consumed": sorted(tracked.consumed), "ignored": ignored,
            "unconsumed": unconsumed}
