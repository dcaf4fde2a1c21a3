"""Serving CLI: model-dir loading, synthetic mode, and the base64-JSONL
wire format round trip against the direct scorer."""

import base64
import json

import numpy as np

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.cli.serve import main as serve_main
from btsbot_tpu.engine.serve import AlertStreamScorer
from btsbot_tpu.engine.train import run_training
from test_engine import SMALL_CFG, synthetic_dataset
from test_stream_serving import _packet


def _train_model_dir(tmp_path):
    cfg = normalize_config({**SMALL_CFG, "epochs": 1})
    r = run_training(cfg, run_name="m", out_root=str(tmp_path),
                     train_ds=synthetic_dataset(64, seed=0),
                     val_ds=synthetic_dataset(32, seed=1),
                     make_figure=False, log=lambda *_: None)
    return r["model_dir"], cfg


def test_serve_cli_synthetic_and_jsonl(tmp_path):
    model_dir, cfg = _train_model_dir(tmp_path)

    # synthetic smoke: N packets in, N result lines out
    out = tmp_path / "scores.jsonl"
    serve_main([model_dir, "--synthetic", "12", "--batch", "8",
                "--out", str(out)])
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 12
    assert all(r["dropped"] is False and 0.0 <= r["score"] <= 1.0
               for r in rows)

    # JSONL wire format: base64 blobs round-trip to the direct scorer
    rng = np.random.default_rng(4)
    packets = [dict(_packet(rng), candid=i) for i in range(5)]
    src = tmp_path / "packets.jsonl"
    with src.open("w") as f:
        for p in packets:
            wire = {"candid": p["candid"], "candidate": p["candidate"]}
            for key in ("cutoutScience", "cutoutTemplate",
                        "cutoutDifference"):
                wire[key] = {"stampData": base64.b64encode(
                    p[key]["stampData"]).decode()}
            f.write(json.dumps(wire) + "\n")

    out2 = tmp_path / "scores2.jsonl"
    serve_main([model_dir, "--jsonl", str(src), "--batch", "8",
                "--out", str(out2)])
    rows = [json.loads(line) for line in out2.read_text().splitlines()]
    assert [r["candid"] for r in rows] == [0, 1, 2, 3, 4]

    from btsbot_tpu.engine.distill import load_teacher
    _, variables, t_cfg = load_teacher(model_dir)
    direct = AlertStreamScorer(t_cfg, variables, batch_size=8,
                               dtype=jnp.bfloat16)
    want, drop = direct(packets)
    assert not drop.any()
    np.testing.assert_allclose([r["score"] for r in rows], want,
                               rtol=1e-4, atol=1e-5)


def test_val_cli_with_calibration(tmp_path):
    """`cli.val --calibrate` writes perf.json with a calibration block."""
    import pandas as pd

    from btsbot_tpu.cli.val import main as val_main
    from test_engine import META_COLS

    model_dir, cfg = _train_model_dir(tmp_path)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    ds = synthetic_dataset(96, seed=2)
    np.save(data_dir / "val_triplets_vtest_N100.npy", ds.images)
    df = pd.DataFrame(ds.metadata, columns=META_COLS)
    df["label"] = ds.labels
    df["objectId"] = [f"ZTFt{i // 4:04d}" for i in range(len(df))]
    df["candid"] = np.arange(len(df))
    df["jd"] = 2459000.0 + np.arange(len(df)) * 0.1
    df["magpsf"] = 18.0 + 0.01 * np.arange(len(df))
    df.to_csv(data_dir / "val_cand_vtest_N100.csv", index=False)

    val_main([model_dir, "--data-dir", str(data_dir), "--calibrate"])

    perf = json.loads((tmp_path / "mm_cnn_vtest_N100_tpu" / "m" /
                       "perf.json").read_text())
    cal = perf["calibration"]
    assert set(cal) == {"temperature", "nll_before", "nll_after",
                        "ece_before", "ece_after"}
    assert cal["nll_after"] <= cal["nll_before"] + 1e-9
