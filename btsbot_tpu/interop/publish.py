"""HuggingFace Hub model publishing.

Equivalent of `/root/reference/btsbot/to_HF.py`: prepare ``train_config.json``
from a model dir's report.json (:10-24), export the best checkpoint as
``pytorch_model.bin`` (:27-43 — here via the JAX→torch exporter so the
artifact stays loadable by the original package), generate the model card
(:55-139), infer (architecture, multi_modal, pretrain) from a config
(:142-162), map to timm/zoobot base-model hub ids (:165-177), and upload
(:180-218).
"""

from __future__ import annotations

import json
import os

from ..core.config import normalize_config
from .hf import get_HF_model_link


def prep_config(model_dir: str) -> dict:
    """report.json → train_config.json (to_HF.py:10-24)."""
    report_path = os.path.join(model_dir, "report.json")
    if not os.path.exists(report_path):
        raise FileNotFoundError(f"Report file not found: {report_path}")
    with open(report_path, "r") as f:
        config = json.load(f)["train_config"]
    with open(os.path.join(model_dir, "train_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return config


def prep_model(model_dir: str, config: dict) -> None:
    """best/ orbax checkpoint → pytorch_model.bin (to_HF.py:27-43)."""
    from ..engine.checkpoint import load_model_variables
    from ..models.factory import init_model
    from .export import save_torch_checkpoint

    config = normalize_config(config)
    _, template = init_model(config, rng=0)
    variables = load_model_variables(
        os.path.join(model_dir, "best"),
        template={"params": template["params"],
                  "batch_stats": template.get("batch_stats", {})})
    save_torch_checkpoint(
        os.path.join(model_dir, "pytorch_model.bin"), config, variables)


def config_to_params(config: dict):
    """(architecture, multi_modal, pretrain) from a train config
    (to_HF.py:142-162)."""
    multi_modal = config["model_name"] == "frozen_fusion"
    image_config = config["image_model_config"] if multi_modal else config
    kind = image_config["model_kind"]
    if "maxvit" in kind:
        architecture = "maxvit"
    elif "inceptionnext" in kind:
        # TPU-native serving variant (models/convnext.py) — trained from
        # scratch or distilled; no timm base checkpoint exists
        architecture = "inceptionnext"
    elif "convnext" in kind:
        architecture = "convnext"
    else:
        raise ValueError("Couldn't understand architecture")
    if architecture == "inceptionnext":
        pretrain = "randinit"
    elif "mwalmsley" in kind:
        pretrain = "galaxyzoo"
    elif not image_config.get("pretrained", True):
        pretrain = "randinit"
    elif "in1k" in kind:
        pretrain = "imagenet"
    else:
        raise ValueError("Couldn't understand pre-training regimen")
    return architecture, multi_modal, pretrain


def get_HF_basemodel(arch: str, pretrain: str) -> str:
    """Base-model hub ids (to_HF.py:165-177)."""
    table = {
        ("maxvit", "galaxyzoo"):
            "mwalmsley/baseline-encoder-regression-maxvit_tiny",
        ("maxvit", "imagenet"): "timm/maxvit_tiny_rw_224.sw_in1k",
        ("maxvit", "randinit"): "timm/maxvit_tiny_rw_224.sw_in1k",
        ("convnext", "galaxyzoo"): "mwalmsley/zoobot-encoder-convnext_pico",
        ("convnext", "imagenet"): "timm/convnext_pico.d1_in1k",
        ("convnext", "randinit"): "timm/convnext_pico.d1_in1k",
        # TPU-native variant: no upstream base checkpoint (from scratch /
        # distilled) — None omits the structured base_model card field
        ("inceptionnext", "randinit"): None,
    }
    try:
        return table[(arch, pretrain)]
    except KeyError:
        raise ValueError(
            f"Invalid architecture: {arch} or pre-training regimen: "
            f"{pretrain}") from None


def create_model_card(model_dir: str, arch: str, multi_modal: bool,
                      pretrain: str) -> str:
    """README.md model card (to_HF.py:55-139)."""
    base = get_HF_basemodel(arch, pretrain)
    # base_model is structured Hub metadata (must be a real model id);
    # from-scratch TPU-native kinds omit the line entirely
    base_line = f"\nbase_model: {base}" if base else ""
    card = f"""---
library_name: pytorch
tags:
- vision
- image-classification
- pytorch
license: mit{base_line}
---

# BTSbot

This is a {arch} fine-tuned for classifying alert images from the Zwicky
Transient Facility (ZTF) Bright Transient Survey, trained with the
TPU-native btsbot-tpu framework and exported as a PyTorch checkpoint.
[Rehemtulla et al. 2024](https://arxiv.org/abs/2401.15167) introduced
BTSbot and its classification task;
[Rehemtulla et al. 2025](https://arxiv.org/abs/2512.11957) benchmarked
architectures and pre-training for it.

{f"**Base Model**: [{base}](https://huggingface.co/{base})" if base
   else "**Base Model**: none (TPU-native variant, trained from scratch "
        "or distilled from a trained mm_ConvNeXt)"}

## Usage

```python
import btsbot_tpu
model, variables, config = btsbot_tpu.load_HF_model(
    architecture="{arch}", multi_modal={multi_modal}, pretrain="{pretrain}"
)
```

The checkpoint is also loadable by the original PyTorch BTSbot package.

## License

MIT.
"""
    path = os.path.join(model_dir, "README.md")
    with open(path, "w") as f:
        f.write(card)
    return card


def upload_model_to_hf(model_dir: str, api=None) -> str:
    """Create/refresh the HF repo and upload the three artifacts
    (to_HF.py:180-218).  ``api`` is injectable for offline tests."""
    with open(os.path.join(model_dir, "train_config.json"), "r") as f:
        config = json.load(f)
    arch, multi_modal, pretrain = config_to_params(config)
    link = get_HF_model_link(arch, multi_modal, pretrain)

    if api is None:
        from huggingface_hub import HfApi
        api = HfApi()
    api.create_repo(repo_id=link, repo_type="model", exist_ok=True)
    for filename in ("pytorch_model.bin", "train_config.json", "README.md"):
        path = os.path.join(model_dir, filename)
        if not os.path.exists(path):
            raise FileNotFoundError(f"Required file not found: {path}")
        api.upload_file(path_or_fileobj=path, path_in_repo=filename,
                        repo_id=link, repo_type="model")
    return link


def publish(model_dir: str, api=None) -> str:
    """Full publish pipeline (to_HF.py:221-239)."""
    config = prep_config(model_dir)
    arch, multi_modal, pretrain = config_to_params(config)
    prep_model(model_dir, config)
    create_model_card(model_dir, arch, multi_modal, pretrain)
    return upload_model_to_hf(model_dir, api=api)
