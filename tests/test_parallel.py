"""Multi-chip sharding on the 8-device virtual CPU mesh: DP batch sharding,
TP kernel sharding, gradient correctness vs single-device, and the
run_training mesh path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.engine.state import create_train_state, make_optimizer
from btsbot_tpu.engine.steps import make_train_step
from btsbot_tpu.engine.train import run_training
from btsbot_tpu.parallel.mesh import batch_sharding, make_mesh
from btsbot_tpu.parallel.sharding import shard_variables, variables_shardings
from test_engine import SMALL_CFG, synthetic_dataset


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_sharding_rules():
    config = normalize_config({
        **SMALL_CFG, "model_name": "mm_ConvNeXt",
        "model_kind": "convnext_pico.d1_in1k",
    })
    _, variables = init_model(config, rng=0)
    mesh = make_mesh(data=4, model=2)
    shardings = variables_shardings(variables["params"], mesh)
    # wide MLP kernels are model-sharded, small leaves replicated
    mlp_kernel = shardings["backbone"]["stage2"]["block0"]["mlp_fc1"]["kernel"]
    assert mlp_kernel.spec == P(None, "model")
    bias = shardings["backbone"]["stage0"]["block0"]["conv_dw"]["bias"]
    assert bias.spec == P()


def test_sharded_train_step_matches_single_device():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=2)
    ds = synthetic_dataset(64, seed=7)
    images = jnp.asarray(ds.images)
    metadata = jnp.asarray(ds.metadata)
    labels = jnp.asarray(ds.labels)
    pw = jnp.float32(1.3)

    # single-device
    state1 = create_train_state(config, variables, tx)
    step1 = make_train_step(model, tx, config)
    state1, m1 = step1(state1, images, metadata, labels, pw)

    # 4x2 mesh
    mesh = make_mesh(data=4, model=2)
    state2 = create_train_state(config, variables, tx)
    state2 = state2.replace(
        params=shard_variables(state2.params, mesh),
        batch_stats=shard_variables(state2.batch_stats, mesh),
        opt_state=shard_variables(state2.opt_state, mesh),
    )
    ds_shard = batch_sharding(mesh)
    step2 = make_train_step(model, tx, config)
    with mesh:
        state2, m2 = step2(
            state2,
            jax.device_put(images, ds_shard),
            jax.device_put(metadata, ds_shard),
            jax.device_put(labels, ds_shard),
            pw,
        )

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    k1 = np.asarray(state1.params["combined_head"]["out"]["kernel"])
    k2 = np.asarray(state2.params["combined_head"]["out"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-5, atol=1e-7)


def test_run_training_with_mesh(tmp_path):
    config = normalize_config({**SMALL_CFG, "epochs": 2, "batch_size": 32})
    mesh = make_mesh()  # 8-way data parallel
    result = run_training(
        config, run_name="mesh", out_root=str(tmp_path),
        train_ds=synthetic_dataset(128, seed=0),
        val_ds=synthetic_dataset(64, seed=1),
        mesh=mesh, make_figure=False, log=lambda *_: None)
    assert np.isfinite(result["history"]["val_loss"]).all()


def test_run_training_mesh_resume_reapplies_sharding(tmp_path):
    """Resuming under a mesh must re-shard the restored host-numpy state
    (r3 review: restore silently dropped to default placement).  TP config
    so param shardings are non-trivial, then assert the resumed run's final
    params actually carry mesh shardings."""
    config = normalize_config({**SMALL_CFG, "epochs": 1, "batch_size": 32})
    mesh = make_mesh(data=4, model=2)
    kwargs = dict(run_name="meshres", out_root=str(tmp_path),
                  train_ds=synthetic_dataset(128, seed=0),
                  val_ds=synthetic_dataset(64, seed=1),
                  mesh=mesh, make_figure=False, log=lambda *_: None)
    run_training(config, **kwargs)
    config2 = normalize_config({**SMALL_CFG, "epochs": 2, "batch_size": 32})
    result = run_training(config2, resume=True, **kwargs)
    assert np.isfinite(result["history"]["val_loss"]).all()
    leaves = jax.tree_util.tree_leaves(result["state"].params)
    assert all(
        getattr(leaf.sharding, "mesh", None) is not None
        and leaf.sharding.mesh.shape == mesh.shape
        for leaf in leaves if hasattr(leaf, "sharding"))


def test_alert_scorer_mesh_sharded():
    from btsbot_tpu.engine.serve import AlertScorer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    ds = synthetic_dataset(40, seed=5)

    single = AlertScorer(config, variables, batch_size=16, dtype=jnp.float32)
    sharded = AlertScorer(config, variables, batch_size=16,
                          dtype=jnp.float32, mesh=make_mesh())
    s1 = single(ds.images, ds.metadata)
    with sharded.mesh:
        s2 = sharded(ds.images, ds.metadata)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)

    # a batch size the data axis can't split must fail loudly at
    # construction, not with an opaque sharding error at dispatch
    with pytest.raises(ValueError, match="divisible"):
        AlertScorer(config, variables, batch_size=100,
                    dtype=jnp.float32, mesh=make_mesh())


def test_multichip_serving_matches_single_device():
    """AlertScorer over the 8-device mesh returns the same scores as the
    single-device path (multi-chip serving data sharding)."""
    import jax.numpy as jnp

    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.engine.serve import AlertScorer
    from test_engine import SMALL_CFG

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    rng = np.random.default_rng(0)
    trips = rng.normal(size=(19, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(19, 25)).astype(np.float32)

    single = AlertScorer(config, variables, batch_size=8, dtype=jnp.float32)
    sharded = AlertScorer(config, variables, batch_size=8,
                          dtype=jnp.float32, mesh=make_mesh(model=1))
    np.testing.assert_allclose(sharded(trips, meta), single(trips, meta),
                               rtol=1e-6, atol=1e-7)
