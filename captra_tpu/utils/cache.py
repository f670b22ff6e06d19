"""Persistent XLA compilation cache setup (first full-model compile through
a remote-compile path can take minutes; cached recompiles are seconds)."""
from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("CAPTRA_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
