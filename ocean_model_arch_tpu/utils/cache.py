"""Persistent XLA compilation cache setup.

On the tunneled TPU platform each compile is a remote round-trip; the
persistent cache makes re-runs of the driver/bench near-instant after the
first compile."""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/ocean_model_arch_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("OCEAN_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
