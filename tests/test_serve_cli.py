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


def test_serve_cli_avro_archive_replay(tmp_path):
    """--avro: a ZTF Avro OCF archive replays through the daemon with the
    in-repo codec and matches the direct scorer."""
    import gzip

    from btsbot_tpu.data.avro import write_ocf, ztf_alert_schema
    from btsbot_tpu.data.fits import write_fits_image

    model_dir, cfg = _train_model_dir(tmp_path)
    meta_cols = cfg["metadata_cols"]

    rng = np.random.default_rng(21)
    packets = []
    for i in range(5):
        p = {"objectId": f"ZTF25x{i}", "candid": i,
             "candidate": {c: float(rng.normal()) for c in meta_cols}}
        for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
            data = rng.normal(size=(63, 63)).astype(np.float32)
            p[key] = {"fileName": f"x{i}.fits.gz",
                      "stampData": gzip.compress(write_fits_image(data))}
        packets.append(p)

    avro_path = tmp_path / "night.avro"
    avro_path.write_bytes(write_ocf(ztf_alert_schema(meta_cols), packets,
                                    codec="deflate", block_records=2))

    out = tmp_path / "avro_scores.jsonl"
    serve_main([model_dir, "--avro", str(avro_path), "--batch", "4",
                "--out", str(out)])
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert [r["candid"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(not r["dropped"] for r in rows)

    from btsbot_tpu.engine.distill import load_teacher
    _, variables, t_cfg = load_teacher(model_dir)
    direct = AlertStreamScorer(t_cfg, variables, batch_size=4)
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


def test_serve_cli_sigterm_drains_and_exits(tmp_path):
    """Daemon lifecycle as a process: stdin-fed serving emits periodic stats
    and shuts down cleanly (exit 0, final stats line) on SIGTERM."""
    import base64 as _b64
    import signal
    import subprocess
    import sys
    import time as _time

    model_dir, _ = _train_model_dir(tmp_path)
    rng = np.random.default_rng(5)
    lines = []
    for i in range(4):
        p = _packet(rng)
        wire = {"candid": i, "candidate": p["candidate"]}
        for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
            wire[key] = {"stampData": _b64.b64encode(
                p[key]["stampData"]).decode()}
        lines.append(json.dumps(wire) + "\n")

    out = tmp_path / "sig_scores.jsonl"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from btsbot_tpu.cli.serve import main;"
        f"main([{str(model_dir)!r}, '--jsonl', '-', '--batch', '8',"
        f" '--out', {str(out)!r}, '--stats-interval', '0.1',"
        " '--max-wait-ms', '50'])")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdin=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo")
    for line in lines:
        proc.stdin.write(line)
    proc.stdin.flush()
    # wait for the daemon to have scored something (results file non-empty)
    deadline = _time.monotonic() + 120
    while _time.monotonic() < deadline:
        if out.exists() and out.read_text().strip():
            break
        _time.sleep(0.2)
    assert out.exists() and out.read_text().strip(), "no scores before kill"

    proc.send_signal(signal.SIGTERM)  # stdin stays open: only the signal
    stderr = proc.communicate(timeout=60)[1]
    assert proc.returncode == 0, stderr
    stats_lines = [json.loads(line) for line in stderr.splitlines()
                   if line.startswith("{")]
    assert any(s.get("action") == "stopping" for s in stats_lines)
    final = stats_lines[-1]
    assert final["alerts_scored"] == 4
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 4


def test_serve_cli_auto_temperature(tmp_path, capsys):
    """--temperature auto reads calibration.temperature from the model
    dir's perf.json (written by cli.val --calibrate)."""
    model_dir, _ = _train_model_dir(tmp_path)
    with open(f"{model_dir}/perf.json", "w") as f:
        json.dump({"calibration": {"temperature": 0.7}}, f)

    out = tmp_path / "auto_scores.jsonl"
    serve_main([model_dir, "--synthetic", "8", "--batch", "8",
                "--out", str(out), "--temperature", "auto"])
    err = capsys.readouterr().err
    assert "calibration temperature 0.7" in err
    auto_rows = [json.loads(line) for line in out.read_text().splitlines()]

    out2 = tmp_path / "fixed_scores.jsonl"
    serve_main([model_dir, "--synthetic", "8", "--batch", "8",
                "--out", str(out2), "--temperature", "0.7"])
    fixed_rows = [json.loads(line) for line in out2.read_text().splitlines()]
    assert [r["score"] for r in auto_rows] == [r["score"] for r in fixed_rows]

    # missing calibration falls back with a notice, still serves
    (tmp_path / "m2").mkdir()
    import shutil
    for item in ("report.json", "best"):
        src = f"{model_dir}/{item}"
        dst = tmp_path / "m2" / item
        shutil.copytree(src, dst) if item == "best" else shutil.copy(src, dst)
    out3 = tmp_path / "fallback.jsonl"
    serve_main([str(tmp_path / "m2"), "--synthetic", "4", "--batch", "8",
                "--out", str(out3), "--temperature", "auto"])
    assert "serving uncalibrated" in capsys.readouterr().err
    assert len(out3.read_text().splitlines()) == 4


def test_val_cli_run_id_revalidation(tmp_path):
    """`cli.val --run-id`: config, run name, and training history come from
    an (injectable) tracking API; the local run dir resolves from the
    training naming convention; diagnostics re-run and perf.json lands in
    the run dir — the reference's logged-run re-validation workflow
    (val.py:685-737) with a fake API, offline."""
    import pandas as pd

    from btsbot_tpu.cli.val import main as val_main
    from btsbot_tpu.metrics.report import load_report_config
    from test_engine import META_COLS

    model_dir, cfg = _train_model_dir(tmp_path)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    ds = synthetic_dataset(96, seed=3)
    np.save(data_dir / "val_triplets_vtest_N100.npy", ds.images)
    df = pd.DataFrame(ds.metadata, columns=META_COLS)
    df["label"] = ds.labels
    df["objectId"] = [f"ZTFr{i // 4:04d}" for i in range(len(df))]
    df["candid"] = np.arange(len(df))
    df["jd"] = 2459000.0 + np.arange(len(df)) * 0.1
    df["magpsf"] = 18.0 + 0.01 * np.arange(len(df))
    df.to_csv(data_dir / "val_cand_vtest_N100.csv", index=False)

    logged_config = load_report_config(model_dir)

    class _FakeRun:
        config = logged_config
        name = "m"

        @staticmethod
        def history():
            return {"train_loss": [0.7, 0.5], "train_accuracy": [0.5, 0.8],
                    "val_loss": [0.72, 0.55], "val_accuracy": [0.5, 0.75]}

    class _FakeApi:
        def run(self, path):
            assert path == "BTSbot/runs/abc123", path
            return _FakeRun()

    val_main(["--run-id", "abc123", "--out-root", str(tmp_path),
              "--data-dir", str(data_dir), "--figure"], api=_FakeApi())

    run_dir = tmp_path / "mm_cnn_vtest_N100_tpu" / "m"
    perf = json.loads((run_dir / "perf.json").read_text())
    assert "roc_auc" in perf and "policy_performance" in perf
    assert (run_dir / "val_diagnostics.pdf").exists()
