/* No-op __register_frame/__deregister_frame interposer.
 *
 * STATUS: retained as an INVESTIGATION ARTIFACT only — no longer installed
 * anywhere.  This was mitigation #4 for the full-suite crash; it changed
 * the crash's shape (SIGSEGV in the FDE walk -> SIGABRT/wild-pointer fault
 * in CPython's allocator) but not its existence, which re-attributed the
 * root cause to heap corruption inside jaxlib's CPU ORC-JIT path rather
 * than libgcc bookkeeping alone.  The shipped disposition is per-process
 * compile-volume bounding via pytest-xdist (see tests/conftest.py and
 * EVIDENCE.md "full-suite segfault").
 *
 * Why this exists (round-5 full-suite SIGSEGV, third autopsy — see
 * EVIDENCE.md "full-suite segfault"): jaxlib's CPU backend JITs code via
 * LLVM ORC, which lazily registers unwind info for emitted code pages with
 * libgcc through __register_frame (libjax_common.so imports it:
 * `nm -D: U __register_frame@GCC_3.0`).  libgcc keeps every such object in
 * a process-global list, and the NEXT C++ throw's _Unwind_Find_FDE
 * classifies all still-unseen objects by READING their FDE bytes.  Any JIT
 * code page that was unmapped without a paired __deregister_frame (XLA
 * compile-time throwaway modules; executable destruction paths) leaves a
 * stale entry, and the next throw anywhere in the process faults on it.
 * Three in-process mitigations (bigger stacks, pinning final executables,
 * serializing parallel codegen) each failed to stop the crash because the
 * leaked registrations happen inside compilation, unreachable from Python.
 *
 * This shim removes the whole failure class: with registration a no-op,
 * the unwinder only ever walks real DSOs (found via dl_iterate_phdr, not
 * this list).  Trade-off: a C++ exception cannot unwind THROUGH a JIT'd
 * XLA frame (it would std::terminate) — XLA's generated code neither
 * throws nor calls back into throwing C++ on the test paths, and the shim
 * is only installed for the pytest process (tests/conftest.py re-exec),
 * never for production CLIs.
 *
 * Build: gcc -shared -fPIC -O2 -o ehframe_shim.so ehframe_shim.c
 */
void __register_frame(void *p) { (void)p; }
void __deregister_frame(void *p) { (void)p; }
