"""Knowledge distillation: loss math, step-level convergence toward the
teacher, and the teacher-dir → faster-student end-to-end workflow
(engine/distill.py — capability beyond the reference, which only trains
from labels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.engine.distill import (
    distill_to_student,
    load_teacher,
    student_config_from_teacher,
)
from btsbot_tpu.engine.loss import binary_kd_loss, weighted_bce_with_logits
from btsbot_tpu.engine.state import create_train_state, make_optimizer
from btsbot_tpu.engine.steps import make_train_step
from btsbot_tpu.engine.train import run_training

from test_engine import META_COLS, SMALL_CFG, synthetic_dataset

TEACHER_CFG = normalize_config({
    **SMALL_CFG,
    "model_name": "mm_ConvNeXt",
    "model_kind": "convnext_atto.tpu_test",
    "train_data_version": "vtest",
    "epochs": 2,
    "batch_size": 32,
})


def test_kd_loss_matches_soft_bce_at_unit_temperature():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    kd = binary_kd_loss(z, t, temperature=1.0)
    soft = jax.nn.sigmoid(t)
    ref = weighted_bce_with_logits(z, soft, 1.0)
    np.testing.assert_allclose(float(kd), float(ref), rtol=1e-6)


def test_kd_loss_zero_gradient_at_teacher_match():
    t = jnp.asarray([-2.0, 0.5, 3.0], jnp.float32)
    for temp in (1.0, 2.0, 4.0):
        g = jax.grad(lambda z: binary_kd_loss(z, t, temp))(t)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
    # and the teacher side never receives gradients (stop_gradient)
    gt = jax.grad(lambda tt: binary_kd_loss(t + 1.0, tt, 2.0))(t)
    np.testing.assert_allclose(np.asarray(gt), 0.0, atol=0.0)


def test_distill_step_converges_to_teacher():
    """Pure-KD training (alpha=0) must pull student scores toward a fixed
    random teacher on fixed inputs — the step-level contract."""
    cfg = normalize_config({**SMALL_CFG, "random_seed": 0,
                            "distill_alpha": 0.0,
                            "distill_temperature": 2.0,
                            "data_aug_h_flip": False,
                            "data_aug_v_flip": False,
                            "data_aug_rot": False})
    teacher_model, teacher_vars = init_model(cfg, rng=7)
    student_model, student_vars = init_model(cfg, rng=3)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(0, 0.3, (64, 63, 63, 3)), jnp.float32)
    meta = jnp.asarray(rng.normal(size=(64, 25)), jnp.float32)
    labels = jnp.asarray(rng.random(64) < 0.5, jnp.float32)

    def agreement(vars_):
        s = jax.nn.sigmoid(student_model.apply(
            vars_, image_input=images, metadata_input=meta,
            train=False).reshape(-1))
        t = jax.nn.sigmoid(teacher_model.apply(
            teacher_vars, image_input=images, metadata_input=meta,
            train=False).reshape(-1))
        return float(jnp.mean(jnp.abs(s - t)))

    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(cfg, student_vars, tx, seed=0)
    step = make_train_step(student_model, tx, cfg,
                           teacher=(teacher_model, teacher_vars))

    before = agreement(student_vars)
    losses = []
    for _ in range(40):
        state, m = step(state, images, meta, labels, jnp.float32(1.0))
        losses.append(float(m["loss"]))
    after = agreement({"params": state.params,
                       "batch_stats": state.batch_stats})
    assert losses[-1] < losses[0]
    assert after < 0.5 * before, (before, after)


def test_distill_to_student_end_to_end(tmp_path):
    """Teacher dir → inceptionnext student: config derivation, training-run
    teacher loading, and val-set score agreement after distillation."""
    train_ds = synthetic_dataset(128, seed=0)
    val_ds = synthetic_dataset(64, seed=1)

    t_result = run_training(
        TEACHER_CFG, run_name="teacher", out_root=str(tmp_path),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)
    teacher_dir = t_result["model_dir"]

    t_model, t_vars, t_cfg = load_teacher(teacher_dir)
    assert t_cfg["model_kind"] == "convnext_atto.tpu_test"

    s_cfg = student_config_from_teacher(
        t_cfg, "inceptionnext_atto", epochs=3, distill_alpha=0.25,
        distill_temperature=2.0)
    assert s_cfg["model_kind"] == "inceptionnext_atto"

    result = distill_to_student(
        teacher_dir=teacher_dir, student_kind="inceptionnext_atto",
        student_config=s_cfg,
        run_name="student", out_root=str(tmp_path / "s"),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)

    hist = result["history"]
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    # student architecture really is the inceptionnext variant
    from btsbot_tpu.engine.checkpoint import load_model_variables
    from btsbot_tpu import build_model
    s_vars = load_model_variables(result["model_dir"] + "/best")
    assert "mixer" in s_vars["params"]["backbone"]["stage0"]["block0"]

    # distilled student tracks the teacher on held-out alerts
    s_model = build_model(s_cfg)
    imgs = jnp.asarray(val_ds.images[:64])
    meta = jnp.asarray(val_ds.metadata[:64])
    s = jax.nn.sigmoid(s_model.apply(
        s_vars, image_input=imgs, metadata_input=meta,
        train=False).reshape(-1))
    t = jax.nn.sigmoid(t_model.apply(
        t_vars, image_input=imgs, metadata_input=meta,
        train=False).reshape(-1))
    assert float(jnp.mean(jnp.abs(s - t))) < 0.25


def test_distill_cli_end_to_end(tmp_path):
    """`python -m btsbot_tpu.cli.distill <teacher_dir>`: trains a student
    from reference-convention data files on disk."""
    import pandas as pd

    from btsbot_tpu.cli.distill import main as distill_main

    # teacher training run (in-memory datasets)
    train_ds = synthetic_dataset(96, seed=0)
    val_ds = synthetic_dataset(48, seed=1)
    cfg = normalize_config({**TEACHER_CFG, "epochs": 1})
    t_result = run_training(cfg, run_name="t", out_root=str(tmp_path),
                            train_ds=train_ds, val_ds=val_ds,
                            make_figure=False, log=lambda *_: None)

    # reference-convention split files for the CLI's data-dir path
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for split, ds in (("train", train_ds), ("val", val_ds)):
        np.save(data_dir / f"{split}_triplets_vtest_N100.npy", ds.images)
        df = pd.DataFrame(ds.metadata, columns=META_COLS)
        df["label"] = ds.labels
        df.to_csv(data_dir / f"{split}_cand_vtest_N100.csv", index=False)

    distill_main([t_result["model_dir"],
                  "--student-kind", "inceptionnext_atto",
                  "--data-dir", str(data_dir),
                  "--out-root", str(tmp_path / "out"),
                  "--epochs", "1", "--alpha", "0.3", "--no-figure"])

    out_dirs = list((tmp_path / "out").rglob("report.json"))
    assert out_dirs, "student run wrote no report.json"
    import json as _json
    report = _json.loads(out_dirs[0].read_text())
    assert report["train_config"]["model_kind"] == "inceptionnext_atto"
    assert report["train_config"]["distill_alpha"] == 0.3


def test_load_teacher_reference_run_dir(tmp_path):
    """A reference-convention training dir (report.json + best_model.pth,
    train.py:337-340) loads through load_teacher / load_BTSbot_model and
    scores identically to the orbax-trained original."""
    import shutil

    import torch

    import btsbot_tpu
    from btsbot_tpu.engine.checkpoint import load_model_variables
    from btsbot_tpu.interop.export import variables_to_torch_state_dict

    train_ds = synthetic_dataset(64, seed=0)
    cfg = normalize_config({**SMALL_CFG, "epochs": 1})
    r = run_training(cfg, run_name="orig", out_root=str(tmp_path),
                     train_ds=train_ds, val_ds=synthetic_dataset(32, seed=1),
                     make_figure=False, log=lambda *_: None)
    variables = load_model_variables(r["model_dir"] + "/best")

    ref_dir = tmp_path / "reference_style_run"
    ref_dir.mkdir()
    shutil.copy(r["model_dir"] + "/report.json", ref_dir / "report.json")
    sd = variables_to_torch_state_dict(cfg, variables)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               ref_dir / "best_model.pth")

    model, loaded, loaded_cfg = btsbot_tpu.load_BTSbot_model(str(ref_dir))
    assert loaded_cfg["model_name"] == "mm_cnn"

    imgs = jnp.asarray(train_ds.images[:8])
    meta = jnp.asarray(train_ds.metadata[:8])
    want = model.apply(variables, image_input=imgs, metadata_input=meta,
                       train=False)
    got = model.apply(loaded, image_input=imgs, metadata_input=meta,
                      train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_distill_with_device_resident_data(tmp_path):
    """Distillation through the device-data path: teacher weights flow into
    the jitted step as arguments (the compile-payload invariant), and
    training still converges."""
    train_ds = synthetic_dataset(96, seed=0)
    val_ds = synthetic_dataset(48, seed=1)
    t_cfg = normalize_config({**TEACHER_CFG, "epochs": 1})
    t_res = run_training(t_cfg, run_name="t", out_root=str(tmp_path),
                         train_ds=train_ds, val_ds=val_ds, make_figure=False,
                         log=lambda *_: None)
    t_model, t_vars, t_loaded_cfg = load_teacher(t_res["model_dir"])

    s_cfg = student_config_from_teacher(
        t_loaded_cfg, "inceptionnext_atto", epochs=2, device_data=True)
    result = distill_to_student(
        teacher=(t_model, t_vars), student_config=s_cfg,
        run_name="s", out_root=str(tmp_path / "s"),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)
    hist = result["history"]
    assert hist["train_loss"][-1] < hist["train_loss"][0]


@pytest.mark.slow
def test_distill_under_mesh_shards_teacher(tmp_path):
    """Distillation with a sharded mesh: teacher weights must be placed by
    the same sharding rules as the student state (ADVICE r2) — the combined
    step compiles and trains on an 8-virtual-device mesh."""
    from btsbot_tpu.parallel.mesh import make_mesh

    train_ds = synthetic_dataset(128, seed=0)
    val_ds = synthetic_dataset(64, seed=1)
    t_result = run_training(
        TEACHER_CFG, run_name="teacher", out_root=str(tmp_path),
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)

    mesh = make_mesh(data=4, model=2)
    result = distill_to_student(
        teacher_dir=t_result["model_dir"],
        student_kind="inceptionnext_atto",
        student_config=None, run_name="student_mesh",
        out_root=str(tmp_path / "sm"), mesh=mesh,
        train_ds=train_ds, val_ds=val_ds, make_figure=False,
        log=lambda *_: None)
    hist = result["history"]
    assert hist["train_loss"][-1] < hist["train_loss"][0]
