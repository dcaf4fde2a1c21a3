"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4).

The environment may pre-register a TPU PJRT plugin from sitecustomize (jax is
already imported by the time conftest runs), so the platform override must go
through jax.config, and XLA_FLAGS must be set before the CPU backend is
first initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
