"""Persistent XLA compilation cache setup (first full-model compile through
a remote-compile path can take minutes; cached recompiles are seconds)."""
from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compile cache (process-global).

    Under pytest this is a hard no-op unless CAPTRA_FORCE_COMPILE_CACHE=1:
    CLI entry mains are invoked in-process by the e2e tests, and a leaked
    global cache config made a later test's huge one-dispatch compile
    SIGSEGV inside the zstd cache write (zstandard itself handles >1 GB
    buffers fine standalone — the crash needs the loaded test process, so
    the cache writer is simply kept out of test processes entirely).
    """
    if ("PYTEST_CURRENT_TEST" in os.environ
            and os.environ.get("CAPTRA_FORCE_COMPILE_CACHE") != "1"):
        return ""
    path = path or os.environ.get("CAPTRA_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
