"""Persistent XLA compilation cache for serving cold-start.

Production brokers restart scorer processes; without a cache every restart
pays the full XLA compile of the serving graph (minutes through a remote
relay, tens of seconds locally).  JAX ships a persistent compilation cache
keyed on (program, compiler flags, platform); this module is the one-call
opt-in, used by ``examples/serving_daemon.py --compile-cache DIR``.

No reference counterpart — the reference serves via ONNX runtimes where the
broker owns warmup (README.md:34-43); here the JAX graph is the production
path, so compile persistence is part of the serving story.
"""

from __future__ import annotations

import jax


def enable(cache_dir: str, min_compile_time_s: float = 0.5) -> None:
    """Turn on JAX's persistent compilation cache at ``cache_dir``.

    Safe to call before or after backend initialization; subsequent
    ``jax.jit`` compilations whose compile time exceeds
    ``min_compile_time_s`` are written to the cache and reloaded by any
    later process with the same program/flags/platform.
    """
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_s))
    # cache even small executables: BTSbot serving graphs are tiny by XLA
    # standards but expensive to *recompile* through a remote relay
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def disable() -> None:
    """Turn the persistent cache back off (mainly for tests)."""
    jax.config.update("jax_compilation_cache_dir", None)
