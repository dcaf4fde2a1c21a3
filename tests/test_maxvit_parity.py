"""MaxViT parity: torch oracle (timm-maxxvit-style naming) vs the flax
backbone, through the checkpoint converter, plus export round trips.

Uses a reduced config (depths (1,1), dims (32,64), 64-native input, window
2) so CPU runtime stays reasonable while covering every component: stem,
stride-2 MBConv with shortcut, SE, window+grid rel-pos attention, resize,
both head surgeries.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from btsbot_tpu import build_model, normalize_config, torch_state_dict_to_variables
from btsbot_tpu.interop.export import variables_to_torch_state_dict
from btsbot_tpu.models import maxvit as maxvit_mod
from torch_maxvit_mirror import TorchMaxViTClassifier, TorchMmMaxViT
from torch_mirrors import randomize_bn_stats

META_COLS = [f"m{i}" for i in range(25)]

TINY_SPEC = {"depths": (1, 1), "dims": (32, 64), "stem_width": 32}

CFG = {
    "model_kind": "maxvit_tiny_rw_64.test",   # native size 64, window 2
    "train_data_version": "v12",
    "metadata_cols": META_COLS,
    "fc1_neurons": 16,
    "fc2_neurons": 8,
    "dropout": 0.3,
    "meta_fc1_neurons": 16,
    "meta_fc2_neurons": 16,
    "meta_dropout": 0.25,
    "comb_fc1_neurons": 8,
    "comb_fc2_neurons": 8,
    "comb_dropout": 0.2,
}


@pytest.fixture(autouse=True)
def tiny_maxvit(monkeypatch):
    monkeypatch.setitem(maxvit_mod.MAXVIT_CONFIGS, "maxvit_tiny", TINY_SPEC)
    yield


def _mirror_kwargs():
    return dict(depths=TINY_SPEC["depths"], dims=TINY_SPEC["dims"],
                stem_width=TINY_SPEC["stem_width"], window=2)


def _rand_inputs(seed=0, n=2):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(n, 25)).astype(np.float32)
    return img, meta


def _state_dict(oracle):
    return {k: v.numpy() for k, v in oracle.state_dict().items()
            if "num_batches_tracked" not in k}


def test_maxvit_image_only_parity():
    config = normalize_config({**CFG, "model_name": "MaxViT"})
    torch.manual_seed(21)
    oracle = TorchMaxViTClassifier(dict(config), image_size=64,
                                   **_mirror_kwargs()).eval()
    randomize_bn_stats(oracle, seed=4)
    # non-trivial rel-pos tables
    for name, p in oracle.named_parameters():
        if "relative_position_bias_table" in name:
            torch.nn.init.normal_(p, std=0.5)

    img, _ = _rand_inputs()
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())).numpy()

    variables = torch_state_dict_to_variables(config, _state_dict(oracle))
    model = build_model(config)
    got = np.asarray(model.apply(variables, image_input=jnp.asarray(img),
                                 train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_mm_maxvit_parity_and_roundtrip():
    config = normalize_config({**CFG, "model_name": "mm_MaxViT"})
    torch.manual_seed(22)
    oracle = TorchMmMaxViT(dict(config), image_size=64,
                           **_mirror_kwargs()).eval()
    randomize_bn_stats(oracle, seed=5)
    for name, p in oracle.named_parameters():
        if "relative_position_bias_table" in name:
            torch.nn.init.normal_(p, std=0.5)

    img, meta = _rand_inputs(seed=1)
    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            torch.from_numpy(meta)).numpy()

    sd = _state_dict(oracle)
    variables = torch_state_dict_to_variables(config, sd)
    model = build_model(config)
    got = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    # export round trip is the identity on every key (exporter additionally
    # emits torch's num_batches_tracked counters)
    sd2 = {k: v for k, v in
           variables_to_torch_state_dict(config, variables).items()
           if "num_batches_tracked" not in k}
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_rel_pos_table_resize_function():
    """resize_rel_pos_table: identity at same window, constants preserved,
    align-corners keeps the extreme-offset biases."""
    from btsbot_tpu.interop.maxvit_convert import resize_rel_pos_table

    rng = np.random.default_rng(0)
    table = rng.normal(size=((2 * 7 - 1) ** 2, 4)).astype(np.float32)

    np.testing.assert_array_equal(resize_rel_pos_table(table, 7), table)

    const = np.full(((2 * 7 - 1) ** 2, 3), 1.25, np.float32)
    out = resize_rel_pos_table(const, 5)
    assert out.shape == ((2 * 5 - 1) ** 2, 3)
    np.testing.assert_allclose(out, 1.25, rtol=1e-6)

    # corners of the (13,13) grid map to corners of the (9,9) grid
    src = table.reshape(13, 13, 4)
    dst = resize_rel_pos_table(table, 5).reshape(9, 9, 4)
    np.testing.assert_allclose(dst[0, 0], src[0, 0], rtol=1e-5)
    np.testing.assert_allclose(dst[-1, -1], src[-1, -1], rtol=1e-5)
    np.testing.assert_allclose(dst[0, -1], src[0, -1], rtol=1e-5)

    # every interior cell against a brute-force scalar bilinear oracle —
    # corner/constant checks alone once masked a broadcast bug that applied
    # the row fraction to the column lerp (caught in the r3 review pass)
    for target in (5, 4, 9):
        d = 2 * target - 1
        got = resize_rel_pos_table(table, target).reshape(d, d, 4)
        pos = np.linspace(0.0, 12.0, d)
        i0 = np.clip(np.floor(pos).astype(int), 0, 12)
        i1 = np.clip(i0 + 1, 0, 12)
        f = pos - i0
        want = np.zeros((d, d, 4))
        for r in range(d):
            for c in range(d):
                want[r, c] = (
                    src[i0[r], i0[c]] * (1 - f[r]) * (1 - f[c])
                    + src[i1[r], i0[c]] * f[r] * (1 - f[c])
                    + src[i0[r], i1[c]] * (1 - f[r]) * f[c]
                    + src[i1[r], i1[c]] * f[r] * f[c])
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_maxvit_resolution_retarget_via_relpos_interpolation():
    """A checkpoint trained at one resolution loads into a DIFFERENT
    resolution kind: rel-pos tables are bilinearly resampled to the new
    window (the timm adaptation); all other params are resolution
    independent.  64-native oracle weights → 96-native flax model."""
    from btsbot_tpu.models import maxvit as maxvit_mod

    config64 = normalize_config({**CFG, "model_name": "mm_MaxViT"})
    torch.manual_seed(31)
    oracle = TorchMmMaxViT(dict(config64), image_size=64,
                           **_mirror_kwargs()).eval()
    randomize_bn_stats(oracle, seed=7)
    sd = _state_dict(oracle)

    config96 = normalize_config({**CFG, "model_name": "mm_MaxViT",
                                 "model_kind": "maxvit_tiny_rw_96.test"})
    variables = torch_state_dict_to_variables(config96, sd)
    # window 96//32 = 3 → (2*3-1)² = 25-entry tables
    b = variables["params"]["backbone"]["stage0_block0"]
    assert b["attn_block"]["rel_pos_table"].shape[0] == 25
    assert b["attn_grid"]["rel_pos_table"].shape[0] == 25

    model = build_model(config96)
    img, meta = _rand_inputs(seed=9)
    scores = np.asarray(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False))
    assert scores.shape == (2, 1) and np.all(np.isfinite(scores))


def test_retarget_maxvit_variables_matches_checkpoint_path():
    """The flax-run-dir retarget (retarget_maxvit_variables) must land on
    exactly the variables the timm-checkpoint path produces when the same
    state dict is converted directly at the target resolution — and be an
    identity at the native resolution."""
    from btsbot_tpu.interop.maxvit_convert import retarget_maxvit_variables

    config64 = normalize_config({**CFG, "model_name": "mm_MaxViT"})
    torch.manual_seed(33)
    oracle = TorchMmMaxViT(dict(config64), image_size=64,
                           **_mirror_kwargs()).eval()
    randomize_bn_stats(oracle, seed=11)
    sd = _state_dict(oracle)

    vars64 = torch_state_dict_to_variables(config64, sd)
    config96 = normalize_config({**CFG, "model_name": "mm_MaxViT",
                                 "model_kind": "maxvit_tiny_rw_96.test"})
    direct96 = torch_state_dict_to_variables(config96, sd)
    retargeted = retarget_maxvit_variables(vars64, "maxvit_tiny_rw_96.test")

    flat_a = jax.tree_util.tree_leaves_with_path(direct96)
    flat_b = jax.tree_util.tree_leaves_with_path(retargeted)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))

    # identity at the native resolution (tables pass through untouched)
    same = retarget_maxvit_variables(vars64, "maxvit_tiny_rw_64.test")
    t0 = vars64["params"]["backbone"]["stage0_block0"]["attn_block"][
        "rel_pos_table"]
    t1 = same["params"]["backbone"]["stage0_block0"]["attn_block"][
        "rel_pos_table"]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_retarget_model_kind():
    from btsbot_tpu.interop.maxvit_convert import retarget_model_kind

    assert retarget_model_kind("maxvit_tiny_rw_224.sw_in1k", 160) == \
        "maxvit_tiny_rw_160.sw_in1k"
    assert retarget_model_kind("maxvit_tiny_rw_64.test", 96) == \
        "maxvit_tiny_rw_96.test"
    with pytest.raises(ValueError):
        retarget_model_kind("convnext_pico.d1_in1k", 160)
    with pytest.raises(ValueError):
        retarget_model_kind("maxvit_tiny", 160)  # no resolution encoded
    # bare timm kind without a variant suffix still encodes a resolution
    assert retarget_model_kind("maxvit_tiny_rw_224", 160) == \
        "maxvit_tiny_rw_160"


def test_get_model_image_size_bare_kind():
    from btsbot_tpu.models.maxvit import get_model_image_size

    assert get_model_image_size("maxvit_tiny_rw_256") == 256
    assert get_model_image_size("maxvit_tiny_rw_256.sw_in1k") == 256
    assert get_model_image_size("maxvit_tiny") == 224  # no resolution → 224
    assert get_model_image_size("convnext_pico.d1_in1k") == 224


def test_serve_and_export_cli_retarget(tmp_path):
    """--retarget-resolution on the deployment CLIs: the serve daemon scores
    at the retargeted resolution exactly like a directly-retargeted scorer,
    and cli.export emits a verified ONNX artifact at the new resolution."""
    import base64
    import gzip
    import json as json_mod

    from btsbot_tpu import init_model
    from btsbot_tpu.cli.export import main as export_main
    from btsbot_tpu.cli.serve import main as serve_main
    from btsbot_tpu.data.fits import write_fits_image
    from btsbot_tpu.engine.checkpoint import save_model_variables
    from btsbot_tpu.engine.serve import AlertStreamScorer
    from btsbot_tpu.interop.maxvit_convert import (
        retarget_maxvit_variables, retarget_model_kind)
    from btsbot_tpu.metrics.report import make_report

    config = normalize_config({**CFG, "model_name": "mm_MaxViT"})
    _, variables = init_model(config, rng=0)
    model_dir = str(tmp_path / "mdir")
    save_model_variables(f"{model_dir}/best", variables["params"],
                         variables.get("batch_stats", {}))
    make_report(config, f"{model_dir}/report.json",
                {"run_name": "t", "train_loss": [1.0], "val_loss": [1.0],
                 "train_accuracy": [0.5], "val_accuracy": [0.5]}, {})

    rng = np.random.default_rng(7)
    packets = []
    src = tmp_path / "packets.jsonl"
    with src.open("w") as f:
        for i in range(5):
            p = {"candid": i,
                 "candidate": {f"m{k}": float(rng.normal())
                               for k in range(25)}}
            wire = {"candid": i, "candidate": p["candidate"]}
            for key in ("cutoutScience", "cutoutTemplate",
                        "cutoutDifference"):
                data = rng.normal(size=(63, 63)).astype(np.float32)
                blob = gzip.compress(write_fits_image(data))
                p[key] = {"stampData": blob}
                wire[key] = {"stampData": base64.b64encode(blob).decode()}
            packets.append(p)
            f.write(json_mod.dumps(wire) + "\n")

    out = tmp_path / "scores.jsonl"
    serve_main([model_dir, "--jsonl", str(src), "--batch", "4",
                "--out", str(out), "--retarget-resolution", "96"])
    rows = [json_mod.loads(line) for line in out.read_text().splitlines()]
    assert [r["candid"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(not r["dropped"] for r in rows)

    kind96 = retarget_model_kind(config["model_kind"], 96)
    cfg96 = normalize_config({**config, "model_kind": kind96})
    vars96 = retarget_maxvit_variables(variables, kind96)
    direct = AlertStreamScorer(cfg96, vars96, batch_size=4)
    want, drop = direct(packets)
    assert not drop.any()
    np.testing.assert_allclose([r["score"] for r in rows], want,
                               rtol=1e-4, atol=1e-5)

    onnx_out = export_main([model_dir, "--retarget-resolution", "96",
                            "--output", str(tmp_path / "model96.onnx")])
    ver = json_mod.loads(
        (tmp_path / "model96.verification.json").read_text())
    assert ver["close"] and onnx_out.endswith("model96.onnx")
