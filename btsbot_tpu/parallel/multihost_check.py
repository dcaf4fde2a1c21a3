"""Multi-host (multi-process) training-path validation.

The reference's maximum scale is one host with ``torch.nn.DataParallel``
(SURVEY.md §2); this framework scales across hosts with
``jax.distributed`` + a global device mesh (DCN between hosts, ICI within
a slice).  Real multi-host TPU hardware isn't available in the build
environment, so this module is a runnable worker that validates the full
multi-process path on CPU: ``initialize_distributed`` → global (data,)
mesh spanning processes → process-local batch shards assembled into global
arrays → one jitted, gradient-all-reduced train step → identical finite
loss on every process (gloo CPU collectives).

Run one process per "host":

    python -m btsbot_tpu.parallel.multihost_check <process_id> \
        <num_processes> <coordinator_port> [devices_per_process]

tests/test_multihost.py spawns two such processes and asserts agreement.
"""

from __future__ import annotations

import os
import sys


def run_worker(process_id: int, num_processes: int, port: int,
               devices_per_process: int = 2, model_axis: int = 1,
               steps: int = 2, die_after_step: int | None = None,
               heartbeat_timeout: int | None = None) -> dict:
    """Execute the multi-host check in THIS process.  jax must not have
    initialized a backend yet: the virtual-device count is applied through
    XLA_FLAGS here, before the first backend use.
    Returns {'loss': float, 'global_devices': int}.

    ``die_after_step`` simulates an abrupt host failure (fault-injection
    harness): after completing that step this process ``os._exit(17)``s
    without any shutdown handshake; survivors must then fail fast (the
    coordination service's heartbeat detection, bounded by
    ``heartbeat_timeout``) instead of hanging in the dead host's
    collectives."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{devices_per_process}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from .mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=num_processes,
                           process_id=process_id,
                           heartbeat_timeout_seconds=heartbeat_timeout)

    import numpy as np

    import jax.numpy as jnp
    # (shardings come from parallel.sharding.variables_shardings)

    from ..core.config import normalize_config
    from ..engine.state import create_train_state, make_optimizer
    from ..engine.steps import make_train_step
    from ..models.factory import init_model
    from .mesh import batch_sharding, make_mesh

    assert jax.process_count() == num_processes
    assert jax.local_device_count() == devices_per_process, (
        f"{jax.local_device_count()} local devices != requested "
        f"{devices_per_process} (was a backend already initialized?)")
    global_devices = jax.device_count()

    config = normalize_config({
        "model_name": "mm_cnn", "train_data_version": "vmh",
        "metadata_cols": [f"m{i}" for i in range(25)],
        "conv1_channels": 4, "conv2_channels": 4, "conv_kernel": 3,
        "conv_dropout1": 0.1, "conv_dropout2": 0.1,
        "meta_fc1_neurons": 8, "meta_fc2_neurons": 8, "meta_dropout": 0.1,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
        "learning_rate": 1e-3, "beta_1": 0.9, "beta_2": 0.999,
        "batch_size": 8, "epochs": 1, "patience": 1, "random_seed": 0,
    })

    # every process initializes identically (same seed → same params)
    model, variables = init_model(config, rng=0)
    tx = make_optimizer(config, steps_per_epoch=2)
    state = create_train_state(config, variables, tx, seed=0)
    train_step = make_train_step(model, tx, config)

    # model_axis > 1 makes a (data, model) mesh whose model axis spans
    # processes: wide kernels are tensor-sharded ACROSS hosts, so the TP
    # collectives ride the inter-process (DCN-equivalent) transport too
    mesh = make_mesh(model=model_axis)
    data_shard = batch_sharding(mesh)

    from .sharding import variables_shardings

    def host_to_global(tree):
        # every process holds the full host value; build each global array
        # by slicing out whatever shard the (data, model) sharding assigns
        shardings = variables_shardings(tree, mesh)

        def make(x, s):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx, a=arr: a[idx])

        return jax.tree.map(make, tree, shardings)

    state = state.replace(
        params=host_to_global(state.params),
        batch_stats=host_to_global(state.batch_stats),
        opt_state=host_to_global(state.opt_state),
    )

    # global batch assembled from per-process local shards (how a real
    # multi-host input pipeline feeds the mesh)
    global_batch = 16
    local = global_batch // num_processes
    rng = np.random.default_rng(100 + process_id)
    imgs = rng.normal(size=(local, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(local, 25)).astype(np.float32)
    labels = (rng.random(local) < 0.5).astype(np.float32)

    def globalize(x):
        return jax.make_array_from_process_local_data(
            data_shard, x, (global_batch,) + x.shape[1:])

    loss = None
    for step_i in range(steps):
        state, metrics = train_step(
            state, globalize(imgs), globalize(meta), globalize(labels),
            jnp.float32(1.0))
        loss = float(metrics["loss"])
        if die_after_step is not None and step_i == die_after_step:
            print(f"MULTIHOST_DYING process={process_id} step={step_i}",
                  flush=True)
            os._exit(17)  # abrupt: no shutdown handshake, like a dead host
    return {"loss": loss, "global_devices": int(global_devices),
            "process_count": int(jax.process_count())}


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    kwargs = {}
    pos = []
    it = iter(argv)
    for a in it:
        if a == "--steps":
            kwargs["steps"] = int(next(it))
        elif a == "--die-after":
            kwargs["die_after_step"] = int(next(it))
        elif a == "--heartbeat-timeout":
            kwargs["heartbeat_timeout"] = int(next(it))
        else:
            pos.append(a)
    process_id, num_processes, port = (int(a) for a in pos[:3])
    devices = int(pos[3]) if len(pos) > 3 else 2
    model_axis = int(pos[4]) if len(pos) > 4 else 1
    result = run_worker(process_id, num_processes, port, devices, model_axis,
                        **kwargs)
    print(f"MULTIHOST_OK process={process_id} "
          f"devices={result['global_devices']} "
          f"processes={result['process_count']} loss={result['loss']:.6f}",
          flush=True)


if __name__ == "__main__":
    # env must be set before jax initializes its backends
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
