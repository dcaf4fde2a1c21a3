"""Full-production-spec MaxViT oracle parity (slow).

Round 1's MaxViT parity test used a reduced spec (depths (1,1), window 2);
this covers the real ``maxvit_tiny_rw_224.sw_in1k`` structure — depths
(2,2,5,2), dims (64,128,256,512), stem 64, window/grid 7, in-graph 63→224
bilinear resize — so the stage counts, stride patterns, and window-7
attention partitions of the production checkpoint layout are cross-checked
against the torch oracle at the reference's tolerance
(rtol 1e-4 / atol 1e-5, to_onnx.py:135-137).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from btsbot_tpu import build_model, normalize_config, torch_state_dict_to_variables
from torch_maxvit_mirror import TorchMmMaxViT
from torch_mirrors import randomize_bn_stats

META_COLS = [f"m{i}" for i in range(25)]

CFG = {
    "model_name": "mm_MaxViT",
    "model_kind": "maxvit_tiny_rw_224.sw_in1k",
    "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "meta_fc1_neurons": 128,
    "meta_fc2_neurons": 128,
    "meta_dropout": 0.25,
    "comb_fc1_neurons": 64,
    "comb_fc2_neurons": 32,
    "comb_dropout": 0.2,
}


@pytest.mark.slow
def test_mm_maxvit_full_tiny_224_parity():
    config = normalize_config(CFG)
    torch.manual_seed(7)
    oracle = TorchMmMaxViT(dict(config), image_size=224,
                           depths=(2, 2, 5, 2), dims=(64, 128, 256, 512),
                           stem_width=64, window=7).eval()
    randomize_bn_stats(oracle, seed=9)
    for name, p in oracle.named_parameters():
        if "relative_position_bias_table" in name:
            torch.nn.init.normal_(p, std=0.5)

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(1, 25)).astype(np.float32)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)  # strict
    model = build_model(config)
    got = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
