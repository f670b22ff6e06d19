"""Persistent XLA compilation cache setup (first full-model compile through
a remote-compile path can take minutes; cached recompiles are seconds)."""
from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def raise_stack_limit(want_bytes: int = 512 << 20) -> None:
    """Raise RLIMIT_STACK's soft limit (best effort, capped by the hard one).

    LLVM's recursive passes can exhaust the default 8 MiB thread stack while
    compiling this framework's largest one-dispatch programs (observed: a
    SIGSEGV inside backend_compile_and_load on the full-size train step).
    glibc sizes pthread stacks from the soft limit at thread creation, so
    call this BEFORE the first jax backend use; the main thread picks up the
    new limit at fault time either way.
    """
    try:
        import resource
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if soft != resource.RLIM_INFINITY and soft < want_bytes:
            new = (want_bytes if hard == resource.RLIM_INFINITY
                   else min(want_bytes, hard))
            resource.setrlimit(resource.RLIMIT_STACK, (new, hard))
    except (ImportError, ValueError, OSError):
        pass  # non-POSIX or privilege-restricted: keep the default


_PINNED_EXECUTABLES: list = []
_PIN_INSTALLED = False


def pin_loaded_executables() -> None:
    """Keep every CPU LoadedExecutable alive for the life of the process.

    Mechanism (round-5 core-dump autopsy, see EVIDENCE.md "full-suite
    segfault"): jaxlib 0.9.0's CPU backend JITs executables through LLVM ORC,
    which __register_frame()s unwind info for the emitted code pages.  When a
    LoadedExecutable is destroyed, the code pages are unmapped but libgcc's
    registered-object bookkeeping can be left stale; the next time the
    unwinder walks the FDE object list (a C++ throw inside libjax_common, or
    a later register/deregister classifying objects), it reads through the
    freed entry and SIGSEGVs.  The crash needs hundreds of compile+destroy
    cycles before one unwind — exactly what a full pytest run produces (and
    no production CLI does).

    Pinning the executables removes the destroy half of the cycle: live
    executables keep their code pages mapped and their EH frames registered,
    so the unwinder never sees a freed entry.  CPU-only (the TPU backend
    doesn't JIT host code through ORC), and memory-bounded by the suite's
    own working set (~GBs on a 125 GB host).
    """
    global _PIN_INSTALLED
    if _PIN_INSTALLED:
        return
    from jax._src import compiler as _compiler

    _orig = _compiler.backend_compile_and_load

    def _pinning_compile_and_load(backend, module, executable_devices,
                                  options, host_callbacks):
        executable = _orig(backend, module, executable_devices, options,
                           host_callbacks)
        try:
            if getattr(backend, "platform", "") == "cpu":
                _PINNED_EXECUTABLES.append(executable)
        except Exception:  # never let pinning break a compile
            pass
        return executable

    _compiler.backend_compile_and_load = _pinning_compile_and_load
    _PIN_INSTALLED = True


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compile cache (process-global).

    Under pytest this is a hard no-op unless CAPTRA_FORCE_COMPILE_CACHE=1:
    CLI entry mains are invoked in-process by the e2e tests, and a leaked
    global cache config made a later test's huge one-dispatch compile
    SIGSEGV inside the zstd cache write (zstandard itself handles >1 GB
    buffers fine standalone — the crash needs the loaded test process, so
    the cache writer is simply kept out of test processes entirely).
    """
    raise_stack_limit()
    if ("PYTEST_CURRENT_TEST" in os.environ
            and os.environ.get("CAPTRA_FORCE_COMPILE_CACHE") != "1"):
        return ""
    path = path or os.environ.get("CAPTRA_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
