"""Torch oracle models for conversion/parity tests.

These re-state the *behavioral contract* of the reference architectures
(`/root/reference/btsbot/architectures.py`) and of the timm backbones the
reference checkpoints are built on, written independently from SURVEY.md's
structural analysis.  They exist so tests can:

1. generate a random torch state dict with the exact key naming of real
   BTSbot checkpoints (positional nn.Sequential keys / timm ConvNeXt keys),
2. run the torch forward as the numerical oracle,
3. assert that btsbot_tpu.interop.convert + the flax models reproduce the
   oracle's outputs to float32 tolerance.

Test-only code; never imported by the package.
"""

from __future__ import annotations

import torch
import torch.nn as nn


# ---------------------------------------------------------------- CNN family

def _conv_stack(c_in: int, c1: int, c2: int, k: int, d1: float, d2: float):
    return nn.Sequential(
        nn.Conv2d(c_in, c1, k, padding="same"), nn.ReLU(),
        nn.Conv2d(c1, c1, k, padding="same"), nn.ReLU(),
        nn.MaxPool2d(2, 2), nn.Dropout2d(d1),
        nn.Conv2d(c1, c2, k, padding="same"), nn.ReLU(),
        nn.Conv2d(c2, c2, k, padding="same"), nn.ReLU(),
        nn.MaxPool2d(4, 4), nn.Dropout2d(d2),
        nn.Flatten(),
    )


def _meta_stack(n_in: int, fc1: int, fc2: int, drop: float, act):
    return nn.Sequential(
        nn.BatchNorm1d(n_in), nn.Linear(n_in, fc1), act(),
        nn.Dropout(drop), nn.Linear(fc1, fc2), act(),
    )


def _head_stack(n_in: int, fc1: int, fc2: int, drop: float, act):
    return nn.Sequential(
        nn.Linear(n_in, fc1), act(), nn.Linear(fc1, fc2), act(),
        nn.Dropout(drop), nn.Linear(fc2, 1),
    )


class TorchMmCnn(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        n_meta = len(cfg["metadata_cols"])
        conv_dim = cfg["conv2_channels"] * (cfg.get("image_size", 63) // 8) ** 2
        self.conv_layers = _conv_stack(
            3, cfg["conv1_channels"], cfg["conv2_channels"],
            cfg["conv_kernel"], cfg["conv_dropout1"], cfg["conv_dropout2"])
        self.metadata_branch = _meta_stack(
            n_meta, cfg["meta_fc1_neurons"], cfg["meta_fc2_neurons"],
            cfg["meta_dropout"], nn.ReLU)
        self.combined_head = _head_stack(
            conv_dim + cfg["meta_fc2_neurons"], cfg["comb_fc1_neurons"],
            cfg["comb_fc2_neurons"], cfg["comb_dropout"], nn.ReLU)

    def forward(self, image_input, metadata_input):
        feats = torch.cat(
            [self.conv_layers(image_input),
             self.metadata_branch(metadata_input)], dim=1)
        return self.combined_head(feats)


class TorchUmCnn(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        conv_dim = cfg["conv2_channels"] * (cfg.get("image_size", 63) // 8) ** 2
        self.conv_layers = _conv_stack(
            3, cfg["conv1_channels"], cfg["conv2_channels"],
            cfg["conv_kernel"], cfg["conv_dropout1"], cfg["conv_dropout2"])
        self.head = _head_stack(
            conv_dim, cfg["fc1_neurons"], cfg["fc2_neurons"], cfg["dropout"],
            nn.ReLU)

    def forward(self, image_input):
        return self.head(self.conv_layers(image_input))


class TorchUmNN(nn.Module):
    def __init__(self, cfg: dict):
        super().__init__()
        n_meta = len(cfg["metadata_cols"])
        self.network = nn.Sequential(
            nn.BatchNorm1d(n_meta),
            nn.Linear(n_meta, cfg["meta_fc1_neurons"]), nn.ReLU(),
            nn.Dropout(cfg["meta_dropout"]),
            nn.Linear(cfg["meta_fc1_neurons"], cfg["meta_fc2_neurons"]),
            nn.ReLU(),
            nn.Linear(cfg["meta_fc2_neurons"], 1),
        )

    def forward(self, metadata_input):
        return self.network(metadata_input)


# ------------------------------------------------------------------ ConvNeXt
# timm-style ConvNeXt-v1 with timm checkpoint key naming
# (stem.{0,1}, stages.{s}.downsample.{0,1},
#  stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}).

class LayerNorm2d(nn.LayerNorm):
    """Channels-first LayerNorm over C of an NCHW tensor."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _ConvNeXtBlock(nn.Module):
    def __init__(self, dim: int, ls_init: float = 1e-6):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, 4 * dim)
        self.gamma = nn.Parameter(ls_init * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.mlp(self.norm(x))
        x = self.gamma * x
        return shortcut + x.permute(0, 3, 1, 2)


class _ConvNeXtStage(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, depth: int, downsample: bool):
        super().__init__()
        if downsample:
            self.downsample = nn.Sequential(
                LayerNorm2d(dim_in, eps=1e-6),
                nn.Conv2d(dim_in, dim_out, 2, stride=2),
            )
        else:
            self.downsample = nn.Identity()
        self.blocks = nn.Sequential(
            *[_ConvNeXtBlock(dim_out) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class TimmStyleConvNeXt(nn.Module):
    """Backbone with timm key naming; exposes .head_in_features."""

    def __init__(self, depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            LayerNorm2d(dims[0], eps=1e-6),
        )
        stages = []
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stages.append(_ConvNeXtStage(
                dims[max(0, s - 1)], dim, depth, downsample=(s > 0)))
        self.stages = nn.Sequential(*stages)
        self.head_in_features = dims[-1]

    def forward(self, x):
        return self.stages(self.stem(x))


class GlobalAvgPool2d(nn.Module):
    def forward(self, x):
        return x.mean(dim=(2, 3), keepdim=True)


class TorchConvNeXtClassifier(nn.Module):
    """Reference image-only ConvNeXt: backbone + Sequential head surgery
    (pool, norm, flatten, fc1, GELU, fc2, GELU, Dropout, out) under the
    attribute names real checkpoints use (convnext.stem..., convnext.head.N)."""

    def __init__(self, cfg: dict, depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)):
        super().__init__()
        backbone = TimmStyleConvNeXt(depths, dims)
        backbone.head = nn.Sequential(
            GlobalAvgPool2d(),
            LayerNorm2d(dims[-1], eps=1e-6),
            nn.Flatten(1),
            nn.Linear(dims[-1], cfg["fc1_neurons"]), nn.GELU(),
            nn.Linear(cfg["fc1_neurons"], cfg["fc2_neurons"]), nn.GELU(),
            nn.Dropout(cfg["dropout"]),
            nn.Linear(cfg["fc2_neurons"], 1),
        )
        self.convnext = backbone

    def forward(self, image_input):
        x = self.convnext(image_input)
        return self.convnext.head(x)


class TorchMmConvNeXt(nn.Module):
    """Reference mm_ConvNeXt (non-LS variant: flatten-only backbone head)."""

    def __init__(self, cfg: dict, depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)):
        super().__init__()
        self.convnext_backbone = TimmStyleConvNeXt(depths, dims)
        self.convnext_backbone.head = nn.Flatten(1)
        n_meta = len(cfg["metadata_cols"])
        self.metadata_branch = _meta_stack(
            n_meta, cfg["meta_fc1_neurons"], cfg["meta_fc2_neurons"],
            cfg["meta_dropout"], nn.GELU)
        self.combined_head = _head_stack(
            dims[-1] + cfg["meta_fc2_neurons"], cfg["comb_fc1_neurons"],
            cfg["comb_fc2_neurons"], cfg["comb_dropout"], nn.GELU)

    def forward(self, image_input, metadata_input):
        x = self.convnext_backbone(image_input)
        x = self.convnext_backbone.head(x)
        feats = torch.cat([x, self.metadata_branch(metadata_input)], dim=1)
        return self.combined_head(feats)


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BatchNorm layers non-trivial running stats so conversion of
    batch_stats is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g))
            m.running_var.copy_(
                torch.rand(m.num_features, generator=g) * 2 + 0.5)
