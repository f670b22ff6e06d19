"""The round-5 full-suite SIGSEGV mitigation must actually capture
executables: pin_loaded_executables() (installed in conftest.py) wraps
jax._src.compiler.backend_compile_and_load and keeps every CPU
LoadedExecutable alive for the process lifetime, so jaxlib's CPU-ORC JIT
never unmaps code pages whose EH frames libgcc may still walk (core-dump
autopsy in EVIDENCE.md; tool: scripts/core_autopsy.py)."""
import jax
import jax.numpy as jnp

from captra_tpu.utils import cache


def test_pin_hook_installed_and_capturing():
    assert cache._PIN_INSTALLED
    before = len(cache._PINNED_EXECUTABLES)

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T

    f(jnp.ones((8, 8), jnp.float32)).block_until_ready()
    assert len(cache._PINNED_EXECUTABLES) > before


def test_pin_survives_function_deletion():
    """Deleting the jitted wrapper must not shrink the pinned list — the
    whole point is that the underlying executable outlives its Python refs."""
    n0 = len(cache._PINNED_EXECUTABLES)

    def make():
        @jax.jit
        def g(x):
            return (x * 3 + 1).sum()

        return g(jnp.arange(16.0)).block_until_ready()

    make()
    assert len(cache._PINNED_EXECUTABLES) > n0
    n1 = len(cache._PINNED_EXECUTABLES)
    import gc

    gc.collect()
    assert len(cache._PINNED_EXECUTABLES) == n1
