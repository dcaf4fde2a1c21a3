"""Pretrained-backbone initialization for training.

The reference's central training recipe starts ConvNeXt/MaxViT models from
pretrained timm/zoobot backbones: ``timm.create_model(config['model_kind'],
pretrained=config['pretrained'])``
(`/root/reference/btsbot/architectures.py:31,62,108,132`), with the
imagenet / galaxyzoo / randinit regimens named in
`from_HF.py:16-29` and the hub ids in `to_HF.py:165-177`
(``timm/convnext_pico.d1_in1k``, ``timm/maxvit_tiny_rw_224.sw_in1k``,
``mwalmsley/zoobot-encoder-convnext_pico``).

This module is the TPU-side equivalent: it takes a *backbone-only* timm or
zoobot state dict (keys ``stem.*`` / ``stages.*`` — no ``convnext.`` /
``convnext_backbone.`` wrapper prefix; classifier discarded) and seeds the
matching subtree of a freshly-initialized model's variables.  Trigger points
(engine/train.py):

* ``backbone_checkpoint: <path>`` config key — load that local checkpoint
  (torch ``.pth``/``.bin`` or numpy ``.npz``); works fully offline;
* ``pretrained: true`` with no ``backbone_checkpoint`` — fetch through timm
  when it is importable (matching the reference recipe verbatim), else fall
  back to random init with a logged notice (offline environments).

Conversion reuses the strict-accounting converters (interop/convert.py /
maxvit_convert.py) and validates key/shape layout against the vendored
manifests (interop/manifests.py) before mapping, so a drifted upstream
checkpoint errors with a precise report instead of half-loading.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from ..core.config import Config, normalize_config
from .convert import (
    TrackedStateDict,
    UnconsumedKeysError,
    _convnext_backbone_params,
    _is_bookkeeping,
    strip_module_prefix,
    t_norm_affine,
)
from .manifests import validate_state_dict

#: wrapper prefixes seen on published backbone checkpoints: DataParallel,
#: zoobot lightning encoders, generic trainer wrappers.
KNOWN_WRAPPER_PREFIXES = ("module.", "encoder.", "model.", "timm_model.")

#: model families that have a pretrained-capable backbone (the reference
#: only builds ConvNeXt/MaxViT from timm — architectures.py:31,62,108,132).
BACKBONE_MODELS = {"ConvNeXt", "mm_ConvNeXt", "MaxViT", "mm_MaxViT"}


def load_backbone_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a backbone checkpoint from disk as numpy arrays.

    Accepts torch ``.pth``/``.bin``/``.pt`` (via torch, CPU map) and numpy
    ``.npz`` archives.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:  # lightning-style
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def normalize_backbone_keys(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Strip known wrapper prefixes until keys start at timm's ``stem.``.

    Repeats until no prefix applies, so nested wrappers strip fully
    regardless of nesting order vs KNOWN_WRAPPER_PREFIXES (e.g.
    ``model.encoder.stem...`` needs ``model.`` then ``encoder.``)."""
    sd = dict(strip_module_prefix(sd))
    stripped = True
    while stripped and sd:
        stripped = False
        for prefix in KNOWN_WRAPPER_PREFIXES:
            if any(k.startswith(prefix) for k in sd) and \
                    all(k.startswith(prefix) or _is_bookkeeping(k)
                        for k in sd):
                sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                      for k, v in sd.items()}
                stripped = True
    return sd


def _uses_head_norm(config: Config) -> bool:
    """Whether the wrapper keeps the backbone's head norm (reference keeps
    pool+norm+flatten for image-only ConvNeXt always, and for mm_ConvNeXt
    only on LS data — architectures.py:109-119,137-143)."""
    if config["model_name"] == "ConvNeXt":
        return True
    return (config["model_name"] == "mm_ConvNeXt"
            and "LS" in config.get("train_data_version", ""))


def backbone_variables(config, state_dict: Mapping[str, Any],
                       validate: bool = True) -> dict:
    """Convert a backbone-only timm/zoobot state dict into the variables
    fragment this model's backbone subtree expects.

    Returns ``{"params": {"backbone": ..., ["head_norm": ...]},
    "batch_stats": {"backbone": ...}}`` (batch_stats only for MaxViT).
    Classifier keys (``head.fc``, ``head.pre_logits``) are discarded, like
    the reference's head surgery; every other key must be consumed.
    """
    config = config if isinstance(config, Config) else normalize_config(config)
    name = config["model_name"]
    if name not in BACKBONE_MODELS:
        raise ValueError(
            f"Model {name} has no pretrained-capable backbone (only "
            f"{sorted(BACKBONE_MODELS)} wrap timm backbones in the "
            f"reference recipe)")
    sd = normalize_backbone_keys(state_dict)
    model_kind = config.model_kind
    if validate:
        # backbone-only manifest: classifier layout varies by pretraining
        # corpus (1k imagenet vs galaxyzoo regression head), so head.* keys
        # are exempt from drift checking and handled by the discard rules
        report = validate_state_dict(sd, model_kind, num_classes=None)
        report["unexpected"] = [k for k in report["unexpected"]
                                if not k.startswith("head.")]
        if report["missing"] or report["unexpected"] or report["mismatched"]:
            parts = []
            if report["missing"]:
                parts.append(f"missing: {', '.join(report['missing'][:8])}")
            if report["unexpected"]:
                parts.append(
                    f"unexpected: {', '.join(report['unexpected'][:8])}")
            if report["mismatched"]:
                parts.append("shape mismatches: " + ", ".join(
                    f"{k} {got}!={want}"
                    for k, got, want in report["mismatched"][:8]))
            raise ValueError(
                f"Backbone checkpoint does not match the {model_kind} "
                f"manifest — {'; '.join(parts)}. Correct the checkpoint / "
                f"model_kind, or pass validate=False to attempt the raw "
                f"conversion (which still refuses to half-load).")

    tracked = TrackedStateDict(sd)
    fragment: dict[str, Any] = {"params": {}, "batch_stats": {}}
    if "ConvNeXt" in name:
        fragment["params"]["backbone"] = _convnext_backbone_params(
            tracked, "", model_kind)
        if "head.norm.weight" in sd and _uses_head_norm(config):
            fragment["params"]["head_norm"] = t_norm_affine(
                tracked, "head.norm")
    else:  # MaxViT family
        from .maxvit_convert import apply_key_aliases, maxvit_backbone_to_flax
        params, stats = maxvit_backbone_to_flax(
            apply_key_aliases(tracked), "", model_kind)
        fragment["params"]["backbone"] = params
        fragment["batch_stats"]["backbone"] = stats

    discardable = tuple(
        f"head.{k}" for k in ("fc.", "pre_logits.", "norm."))
    unconsumed = sorted(
        k for k in sd
        if k not in tracked.consumed and not _is_bookkeeping(k)
        and not k.startswith(discardable))
    if unconsumed:
        raise UnconsumedKeysError(unconsumed, len(sd))
    if not fragment["batch_stats"]:
        fragment.pop("batch_stats")
    return fragment


def _tree_shapes(tree):
    import jax
    return jax.tree.map(lambda x: tuple(int(d) for d in np.shape(x)), tree)


def apply_backbone(variables: Mapping, fragment: Mapping) -> dict:
    """Graft a backbone fragment onto freshly-initialized model variables.

    The fragment's tree structure and leaf shapes must match the target
    subtrees exactly (no silent partial grafts).
    """
    out = {k: dict(v) for k, v in variables.items()}
    for col, sub in fragment.items():
        for key, subtree in sub.items():
            if key not in out.get(col, {}):
                raise KeyError(
                    f"variables[{col!r}] has no {key!r} subtree to seed")
            want = _tree_shapes(out[col][key])
            got = _tree_shapes(subtree)
            if want != got:
                raise ValueError(
                    f"Backbone fragment for {col}/{key} does not match the "
                    f"model tree (checkpoint shapes vs model shapes differ); "
                    f"check model_kind. Fragment: {got}\nModel: {want}")
            out[col][key] = subtree
    return out


def fetch_timm_backbone(config) -> dict[str, np.ndarray] | None:
    """Reference-recipe path: pull the pretrained backbone through timm when
    it is importable (architectures.py:31,62,108,132); None when offline."""
    try:
        import timm  # noqa: F401
    except ImportError:
        return None
    import timm

    model = timm.create_model(config.model_kind, pretrained=True)
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def init_from_backbone_checkpoint(config, variables,
                                  checkpoint: str | Mapping[str, Any],
                                  validate: bool = True) -> dict:
    """Seed model variables from a backbone checkpoint (path or state dict)."""
    if isinstance(checkpoint, (str, os.PathLike)):
        checkpoint = load_backbone_state_dict(os.fspath(checkpoint))
    fragment = backbone_variables(config, checkpoint, validate=validate)
    return apply_backbone(variables, fragment)


def maybe_init_pretrained(config, variables, log=print) -> dict:
    """engine/train.py hook: apply the configured pretrained-backbone
    initialization, if any.  Precedence: explicit ``backbone_checkpoint``
    path, then ``pretrained: true`` via timm, else random init."""
    config = config if isinstance(config, Config) else normalize_config(config)
    path = config.get("backbone_checkpoint")
    if path:
        variables = init_from_backbone_checkpoint(config, variables, path)
        log(f"Initialized {config['model_name']} backbone from {path}")
        return variables
    if config.get("pretrained", False) and \
            config["model_name"] in BACKBONE_MODELS:
        if "inceptionnext" in str(config.get("model_kind", "")):
            # TPU-native kinds have no timm checkpoint by construction —
            # train from scratch or distill (engine/distill.py); the
            # pretrained flag is inherited from reference configs and moot
            log("model_kind is a TPU-native inceptionnext variant; "
                "pretrained has no source checkpoint (train from scratch "
                "or distill from a trained mm_ConvNeXt)")
            return variables
        sd = fetch_timm_backbone(config)
        if sd is not None:
            variables = init_from_backbone_checkpoint(config, variables, sd)
            log(f"Initialized backbone from timm {config.model_kind} "
                f"(pretrained=true)")
        else:
            log("pretrained=true but timm is unavailable and no "
                "backbone_checkpoint was given; starting from random init "
                "(provide backbone_checkpoint for the reference recipe)")
    return variables
