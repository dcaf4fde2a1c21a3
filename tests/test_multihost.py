"""Multi-host path: 2 spawned processes × 2 virtual CPU devices run a
jointly-sharded train step through initialize_distributed + a global mesh
with gloo collectives, and agree on the loss (SURVEY.md §2's
distributed-backend row — the capability DataParallel never had)."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "btsbot_tpu.parallel.multihost_check",
             str(i), "2", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    losses = []
    for i, out in enumerate(outs):
        m = re.search(r"MULTIHOST_OK process=\d+ devices=(\d+) "
                      r"processes=(\d+) loss=([\d.eE+-]+)", out)
        assert m, f"proc {i} output:\n{out[-2000:]}"
        assert m.group(1) == "4"   # 2 processes x 2 devices, global mesh
        assert m.group(2) == "2"
        losses.append(float(m.group(3)))
    assert losses[0] == losses[1]
    assert 0.0 < losses[0] < 10.0


@pytest.mark.slow
def test_two_process_tensor_parallel_train_step():
    """(data=2, model=2) global mesh across 2 processes × 2 devices: the
    tensor-parallel collectives cross the process boundary (the
    DCN-equivalent transport), not just the DP grad all-reduce."""
    port = _free_port()
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "btsbot_tpu.parallel.multihost_check",
             str(i), "2", str(port), "2", "2"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    losses = []
    for i, out in enumerate(outs):
        m = re.search(r"MULTIHOST_OK process=\d+ devices=(\d+) "
                      r"processes=(\d+) loss=([\d.eE+-]+)", out)
        assert m, f"proc {i} output:\n{out[-2000:]}"
        assert m.group(1) == "4"
        losses.append(float(m.group(3)))
    assert losses[0] == losses[1]
    assert 0.0 < losses[0] < 10.0
