"""Coverage for remaining paths: LS-variant mm_ConvNeXt parity, image-only/
metadata-only training, diagnostics figure writing, serving modality routing,
and the Kowalski raw cache."""

import os

import numpy as np
import pandas as pd
import torch

import jax.numpy as jnp

from btsbot_tpu import build_model, init_model, normalize_config, \
    torch_state_dict_to_variables
from btsbot_tpu.data.dataset import AlertDataset
from btsbot_tpu.engine.serve import AlertScorer
from btsbot_tpu.engine.train import run_training
from test_engine import SMALL_CFG, synthetic_dataset
from torch_mirrors import TimmStyleConvNeXt, _head_stack, _meta_stack, \
    GlobalAvgPool2d, LayerNorm2d, randomize_bn_stats

import torch.nn as nn


class TorchMmConvNeXtLS(nn.Module):
    """Reference mm_ConvNeXt LS variant: backbone head keeps
    pool+norm+flatten (architectures.py:137-141)."""

    def __init__(self, cfg, depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)):
        super().__init__()
        self.convnext_backbone = TimmStyleConvNeXt(depths, dims)
        self.convnext_backbone.head = nn.Sequential(
            GlobalAvgPool2d(), LayerNorm2d(dims[-1], eps=1e-6),
            nn.Flatten(1))
        n_meta = len(cfg["metadata_cols"])
        self.metadata_branch = _meta_stack(
            n_meta, cfg["meta_fc1_neurons"], cfg["meta_fc2_neurons"],
            cfg["meta_dropout"], nn.GELU)
        self.combined_head = _head_stack(
            dims[-1] + cfg["meta_fc2_neurons"], cfg["comb_fc1_neurons"],
            cfg["comb_fc2_neurons"], cfg["comb_dropout"], nn.GELU)

    def forward(self, image_input, metadata_input):
        x = self.convnext_backbone.head(self.convnext_backbone(image_input))
        return self.combined_head(
            torch.cat([x, self.metadata_branch(metadata_input)], dim=1))


def test_mm_convnext_ls_variant_parity():
    config = normalize_config({
        "model_name": "mm_ConvNeXt",
        "model_kind": "convnext_pico.d1_in1k",
        "train_data_version": "v11LS63",     # "LS" triggers pool+norm head
        "metadata_cols": [f"m{i}" for i in range(25)],
        "meta_fc1_neurons": 32, "meta_fc2_neurons": 32, "meta_dropout": 0.25,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.2,
    })
    torch.manual_seed(31)
    oracle = TorchMmConvNeXtLS(dict(config)).eval()
    randomize_bn_stats(oracle, seed=8)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 25)).astype(np.float32)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)
    got = np.asarray(model.apply(variables, image_input=jnp.asarray(img),
                                 metadata_input=jnp.asarray(meta),
                                 train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_image_only_and_metadata_only_training(tmp_path):
    img_cfg = normalize_config({**SMALL_CFG, "model_name": "um_cnn",
                                "fc1_neurons": 16, "fc2_neurons": 8,
                                "dropout": 0.1, "epochs": 2})
    ds = synthetic_dataset(128, seed=0)
    r = run_training(img_cfg, run_name="img", out_root=str(tmp_path / "i"),
                     train_ds=AlertDataset(labels=ds.labels, images=ds.images),
                     val_ds=AlertDataset(labels=ds.labels, images=ds.images),
                     make_figure=False, log=lambda *_: None)
    assert np.isfinite(r["history"]["val_loss"]).all()

    meta_cfg = normalize_config({**SMALL_CFG, "model_name": "um_nn",
                                 "epochs": 6, "patience": 10,
                                 "learning_rate": 5e-3})
    r2 = run_training(meta_cfg, run_name="meta", out_root=str(tmp_path / "m"),
                      train_ds=AlertDataset(labels=ds.labels,
                                            metadata=ds.metadata),
                      val_ds=AlertDataset(labels=ds.labels,
                                          metadata=ds.metadata),
                      make_figure=False, log=lambda *_: None)
    assert r2["history"]["val_accuracy"][-1] > 0.7


def test_diagnostics_figure_written(tmp_path):
    from btsbot_tpu.metrics.diagnostics import diagnostic_summary

    rng = np.random.default_rng(0)
    n = 120
    cand = pd.DataFrame({
        "objectId": [f"ZTF{i//4:04d}" for i in range(n)],
        "jd": 2459000 + np.arange(n) * 0.3,
        "magpsf": rng.uniform(16, 21, n),
    })
    cand["peakmag"] = cand.groupby("objectId")["magpsf"].transform("min")
    labels = rng.integers(0, 2, n)
    scores = np.clip(labels * 0.5 + rng.normal(0.3, 0.2, n), 0.01, 0.99)

    fig_path = str(tmp_path / "diag.pdf")
    summary = diagnostic_summary(cand, scores, labels,
                                 run_data={"run_name": "t",
                                           "loss": [1, 0.5],
                                           "val_loss": [1, 0.6],
                                           "accuracy": [0.5, 0.8],
                                           "val_accuracy": [0.5, 0.7]},
                                 make_figure=True, fig_path=fig_path)
    assert os.path.exists(fig_path) and os.path.getsize(fig_path) > 1000
    assert "fig" in summary and "policy_performance" in summary


def test_scorer_modality_routing():
    ds = synthetic_dataset(20, seed=1)
    img_cfg = normalize_config({**SMALL_CFG, "model_name": "um_cnn",
                                "fc1_neurons": 16, "fc2_neurons": 8,
                                "dropout": 0.1})
    _, v1 = init_model(img_cfg, rng=0)
    s1 = AlertScorer(img_cfg, v1, batch_size=8, dtype=jnp.float32)
    out1 = s1(triplets=ds.images)
    assert out1.shape == (20,)

    meta_cfg = normalize_config({**SMALL_CFG, "model_name": "um_nn"})
    _, v2 = init_model(meta_cfg, rng=0)
    s2 = AlertScorer(meta_cfg, v2, batch_size=8, dtype=jnp.float32)
    out2 = s2(metadata=ds.metadata)
    assert out2.shape == (20,)


def test_kowalski_raw_cache_roundtrip(tmp_path):
    from btsbot_tpu.data.query.kowalski import query_alerts
    from test_data_layer import FakeKowalski, _packet

    oid = "ZTF29aaaaaaa"
    p = _packet(seed=1, objid=oid)
    p["candidate"]["programid"] = 1
    client = FakeKowalski({oid: [p]})

    cache = str(tmp_path / "raw")
    a1 = query_alerts([oid], client, 1, save_raw=cache)
    assert os.path.exists(os.path.join(cache, f"{oid}_prog1.npy"))

    # second pass loads from cache — a client that errors proves no query
    class Exploding:
        def query(self, q):
            raise AssertionError("should have used the cache")

    a2 = query_alerts([oid], Exploding(), 1, load_raw=cache)
    assert len(a2) == len(a1) == 1
    np.testing.assert_allclose(a1[0]["triplet"], a2[0]["triplet"])

def test_reference_facade_names_resolve():
    """Every public name the reference exports from its package facade
    (/root/reference/btsbot/__init__.py:28-46) has a btsbot_tpu counterpart
    under the same name, except the torch transform class
    (RandomRightAngleRotation -> ops.augment functional equivalent) and the
    module re-exports."""
    import btsbot_tpu as b

    reference_names = [
        "__version__", "FlexibleDataset", "make_report",
        "MaxViT", "ConvNeXt", "mm_MaxViT", "mm_ConvNeXt",
        "mm_cnn", "um_cnn", "um_nn", "frozen_fusion",
        "download_HF_model", "load_HF_model",
    ]
    for name in reference_names:
        assert getattr(b, name) is not None, name
    # the model aliases resolve to the registry's flax modules
    assert b.mm_cnn is b.MODEL_REGISTRY["mm_cnn"]
    assert b.mm_ConvNeXt is b.MODEL_REGISTRY["mm_ConvNeXt"]


def test_compile_cache_round_trip(tmp_path):
    """utils/compile_cache: entries are written on compile and a fresh
    compilation of the same program is served from the cache dir."""
    import jax
    import jax.numpy as jnp

    from btsbot_tpu.utils.compile_cache import disable, enable

    cache = tmp_path / "xla_cache"
    enable(str(cache), min_compile_time_s=0.0)
    try:
        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        f(jnp.ones((32, 32))).block_until_ready()
        # count only this test's program: unrelated aux programs
        # (convert_element_type, broadcast) may persist at their own pace
        # when the full suite has pre-warmed jax's in-memory caches
        entries = [p for p in cache.iterdir() if p.name.startswith("jit_f-")]
        assert entries, "no persistent cache entry written for jit_f"
        # same program again from a cleared in-memory cache: the persistent
        # dir must satisfy it (no new jit_f entry, no error)
        jax.clear_caches()
        f(jnp.ones((32, 32))).block_until_ready()
        after = [p for p in cache.iterdir() if p.name.startswith("jit_f-")]
        assert len(after) == len(entries)
    finally:
        disable()
