"""Torch oracle for MaxViT conversion/parity tests.

Implements MaxViT (Tu et al. 2022) in torch with timm-maxxvit-style key
naming (stem.conv1/norm1/conv2, stages.{s}.blocks.{b}.conv.* /
.attn_block.* / .attn_grid.*) so the btsbot-tpu MaxViT converter and
exporter can be validated bidirectionally.  Math mirrors the documented
contract of btsbot_tpu.models.maxvit: pre-norm MBConv with SE(silu),
window/grid partitions, swin-style relative position bias (same index
convention), exact GELU, pre-LN transformer sublayers.

Test-only code; never imported by the package.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

def _rel_position_index(win: int) -> np.ndarray:
    """Independent scalar-loop construction of the swin-style (win², win²)
    index into a (2·win−1)² bias table: table row for query (qr, qc) and key
    (kr, kc) is (qr−kr+win−1)·(2·win−1) + (qc−kc+win−1).

    Deliberately NOT imported from btsbot_tpu.models.maxvit (it once was —
    r3 review): the oracle must implement the convention itself or a
    transposed/shifted index in the package would pass every parity test."""
    n = win * win
    out = np.zeros((n, n), dtype=np.int32)
    for q in range(n):
        qr, qc = divmod(q, win)
        for k in range(n):
            kr, kc = divmod(k, win)
            out[q, k] = (qr - kr + win - 1) * (2 * win - 1) \
                + (qc - kc + win - 1)
    return out


class SqueezeExcite(nn.Module):
    def __init__(self, mid_chs: int, rd_chs: int):
        super().__init__()
        self.fc1 = nn.Conv2d(mid_chs, rd_chs, 1)
        self.fc2 = nn.Conv2d(rd_chs, mid_chs, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class Shortcut(nn.Module):
    def __init__(self, in_chs: int, out_chs: int, stride: int):
        super().__init__()
        self.stride = stride
        self.conv = nn.Conv2d(in_chs, out_chs, 1)

    def forward(self, x):
        if self.stride == 2:
            x = F.avg_pool2d(x, 2, 2)
        return self.conv(x)


class MBConvBlock(nn.Module):
    """Pre-norm MBConv matching btsbot_tpu.models.maxvit.MBConv."""

    def __init__(self, in_chs: int, out_chs: int, stride: int,
                 expand: int = 4, se_ratio: float = 0.25):
        super().__init__()
        mid = in_chs * expand
        self.pre_norm = nn.BatchNorm2d(in_chs)
        self.conv1_1x1 = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.norm1 = nn.BatchNorm2d(mid)
        self.conv2_kxk = nn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                                   groups=mid, bias=False)
        self.norm2 = nn.BatchNorm2d(mid)
        self.se = SqueezeExcite(mid, max(1, int(in_chs * se_ratio)))
        self.conv3_1x1 = nn.Conv2d(mid, out_chs, 1)
        if stride == 2 or in_chs != out_chs:
            self.shortcut = Shortcut(in_chs, out_chs, stride)
        else:
            self.shortcut = nn.Identity()

    def forward(self, x):
        shortcut = self.shortcut(x)
        x = self.pre_norm(x)
        x = F.gelu(self.norm1(self.conv1_1x1(x)), approximate="none")
        x = F.gelu(self.norm2(self.conv2_kxk(x)), approximate="none")
        x = self.se(x)
        x = self.conv3_1x1(x)
        return x + shortcut


class RelPos(nn.Module):
    def __init__(self, window: int, num_heads: int):
        super().__init__()
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, num_heads))
        index = torch.from_numpy(
            np.asarray(_rel_position_index(window), dtype=np.int64))
        self.register_buffer("index", index, persistent=False)

    def forward(self, n: int):
        bias = self.relative_position_bias_table[self.index.reshape(-1)]
        bias = bias.reshape(n, n, -1).permute(2, 0, 1)
        return bias.unsqueeze(0)


class Attention(nn.Module):
    def __init__(self, dim: int, window: int, head_dim: int = 32):
        super().__init__()
        self.num_heads = dim // head_dim
        self.head_dim = head_dim
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos = RelPos(window, self.num_heads)

    def forward(self, x):
        bn, n, c = x.shape
        qkv = self.qkv(x).reshape(bn, n, 3, self.num_heads, self.head_dim)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        attn = (q * self.head_dim ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self.rel_pos(n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bn, n, c)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim: int, expand: int = 4):
        super().__init__()
        self.fc1 = nn.Linear(dim, expand * dim)
        self.fc2 = nn.Linear(expand * dim, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="none"))


class PartitionAttention(nn.Module):
    def __init__(self, dim: int, window: int, grid: bool):
        super().__init__()
        self.window = window
        self.grid = grid
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = Attention(dim, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim)

    def _partition(self, x):
        b, h, w, c = x.shape
        g = self.window
        if self.grid:
            x = x.view(b, g, h // g, g, w // g, c)
            x = x.permute(0, 2, 4, 1, 3, 5).reshape(-1, g * g, c)
        else:
            x = x.view(b, h // g, g, w // g, g, c)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, g * g, c)
        return x

    def _reverse(self, x, h, w):
        g = self.window
        c = x.shape[-1]
        if self.grid:
            x = x.view(-1, h // g, w // g, g, g, c)
            x = x.permute(0, 3, 1, 4, 2, 5).reshape(-1, h, w, c)
        else:
            x = x.view(-1, h // g, w // g, g, g, c)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)
        return x

    def forward(self, x):
        # x: NCHW → operate channels-last like timm's *Cl blocks
        x = x.permute(0, 2, 3, 1)
        _, h, w, _ = x.shape
        t = self._partition(x)
        t = t + self.attn(self.norm1(t))
        t = t + self.mlp(self.norm2(t))
        x = self._reverse(t, h, w)
        return x.permute(0, 3, 1, 2)


class MaxViTTorchBlock(nn.Module):
    def __init__(self, in_chs: int, dim: int, stride: int, window: int):
        super().__init__()
        self.conv = MBConvBlock(in_chs, dim, stride)
        self.attn_block = PartitionAttention(dim, window, grid=False)
        self.attn_grid = PartitionAttention(dim, window, grid=True)

    def forward(self, x):
        return self.attn_grid(self.attn_block(self.conv(x)))


class Stem(nn.Module):
    def __init__(self, width: int):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 3, stride=2, padding=1, bias=False)
        self.norm1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=1, padding=1)

    def forward(self, x):
        return self.conv2(F.gelu(self.norm1(self.conv1(x)),
                                 approximate="none"))


class Stage(nn.Module):
    def __init__(self, in_chs: int, dim: int, depth: int, window: int):
        super().__init__()
        blocks = []
        for b in range(depth):
            blocks.append(MaxViTTorchBlock(
                in_chs if b == 0 else dim, dim, 2 if b == 0 else 1, window))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class TimmStyleMaxViT(nn.Module):
    def __init__(self, depths=(2, 2, 5, 2), dims=(64, 128, 256, 512),
                 stem_width=64, window=7):
        super().__init__()
        self.stem = Stem(stem_width)
        stages = []
        in_chs = stem_width
        for depth, dim in zip(depths, dims):
            stages.append(Stage(in_chs, dim, depth, window))
            in_chs = dim
        self.stages = nn.Sequential(*stages)
        self.head_in_features = dims[-1]

    def forward(self, x):
        return self.stages(self.stem(x))


class GlobalAvgPoolFlat(nn.Module):
    def forward(self, x):
        return x.mean(dim=(2, 3))


class TorchMaxViTClassifier(nn.Module):
    """Reference image-only MaxViT: resize → backbone → Sequential(pool,
    fc1, GELU, fc2, GELU, Dropout, out) (architectures.py:25-51)."""

    def __init__(self, cfg: dict, image_size: int, **kw):
        super().__init__()
        self.image_size = image_size
        backbone = TimmStyleMaxViT(**kw)
        backbone.head = nn.Sequential(
            GlobalAvgPoolFlat(),
            nn.Linear(backbone.head_in_features, cfg["fc1_neurons"]),
            nn.GELU(),
            nn.Linear(cfg["fc1_neurons"], cfg["fc2_neurons"]), nn.GELU(),
            nn.Dropout(cfg["dropout"]),
            nn.Linear(cfg["fc2_neurons"], 1),
        )
        self.maxvit = backbone

    def forward(self, x):
        if x.shape[-1] != self.image_size:
            x = F.interpolate(x, size=(self.image_size, self.image_size),
                              mode="bilinear", align_corners=False)
        return self.maxvit.head(self.maxvit(x))


class TorchMmMaxViT(nn.Module):
    """Reference mm_MaxViT (architectures.py:54-101)."""

    def __init__(self, cfg: dict, image_size: int, **kw):
        super().__init__()
        self.image_size = image_size
        self.maxvit_backbone = TimmStyleMaxViT(**kw)
        self.maxvit_backbone.head = GlobalAvgPoolFlat()
        n_meta = len(cfg["metadata_cols"])
        self.metadata_branch = nn.Sequential(
            nn.BatchNorm1d(n_meta),
            nn.Linear(n_meta, cfg["meta_fc1_neurons"]), nn.GELU(),
            nn.Dropout(cfg["meta_dropout"]),
            nn.Linear(cfg["meta_fc1_neurons"], cfg["meta_fc2_neurons"]),
            nn.GELU(),
        )
        comb_in = self.maxvit_backbone.head_in_features \
            + cfg["meta_fc2_neurons"]
        self.combined_head = nn.Sequential(
            nn.Linear(comb_in, cfg["comb_fc1_neurons"]), nn.GELU(),
            nn.Linear(cfg["comb_fc1_neurons"], cfg["comb_fc2_neurons"]),
            nn.GELU(),
            nn.Dropout(cfg["comb_dropout"]),
            nn.Linear(cfg["comb_fc2_neurons"], 1),
        )

    def forward(self, image_input, metadata_input):
        x = image_input
        if x.shape[-1] != self.image_size:
            x = F.interpolate(x, size=(self.image_size, self.image_size),
                              mode="bilinear", align_corners=False)
        feats = self.maxvit_backbone.head(self.maxvit_backbone(x))
        meta = self.metadata_branch(metadata_input)
        return self.combined_head(torch.cat([feats, meta], dim=1))
