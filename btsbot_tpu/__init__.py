"""btsbot-tpu: TPU-native framework for bright-transient alert classification.

A from-scratch JAX/XLA re-design with the full capability surface of
nabeelre/BTSbot (multi-modal CNN / ConvNeXt / MaxViT classifiers over ZTF
alert triplets + metadata): on-device ingest and augmentation, pjit-sharded
training, science-grade evaluation, and batched alert-stream serving.

Public API mirrors the reference package facade
(`/root/reference/btsbot/__init__.py`) where it makes sense
(``load_HF_model``/``download_HF_model``, model names, report writer) while
exposing the TPU-native engine underneath.
"""

from .version import __version__

from .core.config import (
    Config,
    IMAGE_ONLY_MODELS,
    METADATA_ONLY_MODELS,
    MULTIMODAL_MODELS,
    load_config,
    normalize_config,
)
from .models.factory import MODEL_REGISTRY, build_model, init_model
from .interop.convert import torch_state_dict_to_variables
from .interop.hf import download_HF_model, load_HF_model


def __getattr__(name):
    # Heavier surfaces load lazily so `import btsbot_tpu` stays light.
    if name in ("AlertScorer", "AlertStreamScorer", "AlertStreamConsumer"):
        from .engine import serve
        return getattr(serve, name)
    if name == "run_training":
        from .engine.train import run_training
        return run_training
    if name == "AlertDataset":
        from .data.dataset import AlertDataset
        return AlertDataset
    if name in ("export_onnx", "verify_onnx", "export_and_verify_onnx"):
        from .interop import onnx_export
        return getattr(onnx_export, name)
    if name in ("export_saved_model", "verify_saved_model"):
        from .interop import savedmodel
        return getattr(savedmodel, name)
    if name == "init_from_backbone_checkpoint":
        from .interop.pretrained import init_from_backbone_checkpoint
        return init_from_backbone_checkpoint
    if name == "distill_to_student":
        from .engine.distill import distill_to_student
        return distill_to_student
    if name == "make_report":
        from .metrics.report import make_report
        return make_report
    if name == "load_BTSbot_model":
        # reference helper (architectures.py:322-338): model dir with
        # report.json + best_model.pth → (model, variables, config); also
        # accepts this package's best/ orbax dirs and HF snapshots
        from .engine.distill import load_teacher
        return load_teacher
    if name == "FlexibleDataset":
        # reference name for the in-memory runtime dataset (utils.py:12-42)
        from .data.dataset import AlertDataset
        return AlertDataset
    if name in _REFERENCE_MODEL_NAMES:
        # reference-facade class names (btsbot/__init__.py:16-25); resolve
        # to the flax modules through the registry ("frozen_fusion" included)
        if name == "frozen_fusion":
            from .models.fusion import FrozenFusion
            return FrozenFusion
        return MODEL_REGISTRY[name]
    raise AttributeError(name)


_REFERENCE_MODEL_NAMES = (
    "MaxViT", "ConvNeXt", "mm_MaxViT", "mm_ConvNeXt",
    "mm_cnn", "um_cnn", "um_nn", "frozen_fusion",
)

__all__ = [
    "__version__",
    "Config",
    "load_config",
    "normalize_config",
    "IMAGE_ONLY_MODELS",
    "METADATA_ONLY_MODELS",
    "MULTIMODAL_MODELS",
    "MODEL_REGISTRY",
    "build_model",
    "init_model",
    "torch_state_dict_to_variables",
    "download_HF_model",
    "load_HF_model",
    "AlertScorer",
    "AlertStreamScorer",
    "AlertStreamConsumer",
    "run_training",
    "AlertDataset",
    "export_onnx",
    "verify_onnx",
    "export_and_verify_onnx",
    "export_saved_model",
    "verify_saved_model",
    "init_from_backbone_checkpoint",
    "distill_to_student",
    "make_report",
    "FlexibleDataset",
    "MaxViT",
    "ConvNeXt",
    "mm_MaxViT",
    "mm_ConvNeXt",
    "mm_cnn",
    "um_cnn",
    "um_nn",
    "frozen_fusion",
    "load_BTSbot_model",
]
