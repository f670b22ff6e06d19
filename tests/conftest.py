"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run
anywhere (SURVEY.md §4 test strategy), and keep x64 off (TPU-realistic).

Note: the axon TPU plugin pins JAX_PLATFORMS in the environment, so the env
var alone does not stick — `jax.config.update` after import does.
"""
import os

# ---------------------------------------------------------------------------
# Full-suite crash containment (round-5 final disposition).  A single pytest
# process accumulating the whole suite's XLA-CPU compile volume (hundreds of
# ORC-JIT compile cycles) eventually corrupts the process heap: four
# independent core-dump autopsies (EVIDENCE.md "full-suite segfault") show
# late-suite faults with no stable site — twice inside libgcc's FDE search
# walking a freed JIT EH-frame object, once inside CPython's obmalloc/GC on
# a wild pointer (0x3000000000000), preceded by a cascade of spurious test
# failures that all pass standalone.  Four in-process mitigations (512 MiB
# stacks, pinning final executables, serializing parallel codegen, no-op'ing
# __register_frame via an LD_PRELOAD shim — kept as an investigation
# artifact in native/ehframe_shim.c) each changed the crash's shape but not
# its existence; the corruption happens inside jaxlib 0.9.0's CPU JIT path,
# unreachable from Python.  Disposition: bound the per-process compile
# volume instead — pyproject.toml runs the suite under pytest-xdist
# (4 worker processes, --dist loadfile), so each interpreter stays at ~25%
# of the suite's compile volume, a >2x margin below the earliest observed
# corruption threshold (~55-60%).  Workers are full fresh interpreters, so
# this keeps "one pytest invocation" semantics while isolating the fault.

# The round-4 full-suite SIGSEGV (with the persistent compile cache already
# disabled) died inside backend_compile_and_load on a large train-step
# program: LLVM's recursive passes can exhaust the default 8 MiB thread
# stack.  Raise the soft limit BEFORE the backend initializes so XLA's
# compilation threads (glibc sizes pthread stacks from the soft limit at
# creation) and the main thread (kernel checks the rlimit at fault time)
# both get room.
from captra_tpu.utils.cache import raise_stack_limit  # noqa: E402

raise_stack_limit()

# Must be set before the backend initializes (lazily, at first jax use).
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compile cache is hard-disabled under pytest (see
# captra_tpu/utils/cache.py): a CLI e2e main leaking the global cache
# config made a later test's huge compile segfault inside the zstd write.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Round-5 full-suite SIGSEGV, second autopsy (EVIDENCE.md): the executable
# pin below did NOT stop the crash — the libgcc unwinder still read an
# unmapped JIT EH-frame page mid-compile.  XLA CPU's parallel codegen
# (default split count 32) compiles every program as ~32 separate ORC
# dylibs on pool threads, each __register_frame/__deregister_frame-ing
# per-part code pages DURING compilation — churn a Python-level pin of the
# *final* executable can never reach, racing libgcc's lock-free FDE btree
# (GCC 12) against unwinds.  Serialize codegen: one part per program, no
# concurrent register/unmap, ~32x fewer registered objects.  On this
# 1-CPU host parallel codegen bought nothing anyway.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Belt and braces: disable the persistent-compile-cache *feature* for the
# whole test process, so even a code path that sets jax_compilation_cache_dir
# (enable_compile_cache is a pytest no-op, but anything could regress) never
# routes compiles through the cache reader/writer.
jax.config.update("jax_enable_compilation_cache", False)

# Round-5 fix for the full-suite SIGSEGV (EXIT=139 at ~86%, inside
# backend_compile_and_load): the core-dump autopsy (EVIDENCE.md) showed the
# libgcc unwinder reading a freed JIT EH-frame object after hundreds of
# executable create/destroy cycles — a jaxlib CPU-ORC bookkeeping bug, not a
# stack or cache issue (round-4's two candidate fixes were already in and the
# crash reproduced solo).  Mitigation: never destroy CPU executables in this
# process; pin them for the suite's lifetime.
from captra_tpu.utils.cache import pin_loaded_executables  # noqa: E402

pin_loaded_executables()

import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_runtest_teardown(item):
    # Pinpoint (and contain) any test that leaks the process-global compile
    # cache config — the round-3 full-suite segfault was this leak plus a
    # later huge compile crashing in the zstd cache write.
    if jax.config.jax_compilation_cache_dir is not None:
        sys.stderr.write(
            f"\n[conftest] compile-cache dir leaked by {item.nodeid}; reset\n")
        jax.config.update("jax_compilation_cache_dir", None)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
