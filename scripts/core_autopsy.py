#!/usr/bin/env python3
"""Minimal x86-64 ELF core-dump autopsy (no gdb on this host).

Used for the round-5 analysis of the full-suite SIGSEGV (EXIT=139 inside
``jax/_src/compiler.py:362 backend_compile_and_load``).  What it does:

1. Parse PT_NOTE: NT_SIGINFO (signal, si_code, si_addr), NT_PRSTATUS per
   thread (registers), NT_FILE (address -> mapped file).
2. If si_code == SI_TKILL (-6) the recorded signal is a *re-raise* (here:
   faulthandler re-raising from its handler) and the original fault context
   lives in the rt_sigframe on the handler's altstack: scan above the
   faulting thread's RSP for a ucontext with trapno==14 (page fault) and
   print the ORIGINAL rip/rsp/CR2, plus return addresses found on the
   original stack.

Findings for /root/repo core of 2026-08-19 (recorded in EVIDENCE.md):
original fault = read of 0x7fa4a14e5000 (unmapped gap inside the CPU-ORC
JIT code-page neighborhood: hundreds of 1-page r-x/r--/4-page rw mappings)
with RIP in libgcc's FDE-search internals and the original stack full of
_Unwind_* frames called from libjax_common.so -> stale JIT EH-frame object
after executable destruction.  Mitigation:
captra_tpu/utils/cache.py::pin_loaded_executables().

Usage: python scripts/core_autopsy.py CORE [FAULT_ADDR_HEX]
"""
from __future__ import annotations

import struct
import sys


def parse(path: str):
    f = open(path, "rb")
    hdr = f.read(64)
    assert hdr[:4] == b"\x7fELF" and hdr[4] == 2, "need 64-bit ELF core"
    e_phoff, = struct.unpack_from("<Q", hdr, 0x20)
    e_phentsize, = struct.unpack_from("<H", hdr, 0x36)
    e_phnum, = struct.unpack_from("<H", hdr, 0x38)
    f.seek(e_phoff)
    phdrs = f.read(e_phentsize * e_phnum)
    notes, loads = [], []
    for i in range(e_phnum):
        (p_type, _fl, p_off, p_vaddr, _pa, p_filesz, p_memsz,
         _al) = struct.unpack_from("<IIQQQQQQ", phdrs, i * e_phentsize)
        if p_type == 4:
            notes.append((p_off, p_filesz))
        elif p_type == 1:
            loads.append((p_vaddr, p_memsz, p_off, p_filesz))
    return f, notes, loads


def align4(x: int) -> int:
    return (x + 3) & ~3


REGS = ["r15", "r14", "r13", "r12", "rbp", "rbx", "r11", "r10", "r9", "r8",
        "rax", "rcx", "rdx", "rsi", "rdi", "orig_rax", "rip", "cs",
        "eflags", "rsp", "ss", "fs_base", "gs_base", "ds", "es", "fs", "gs"]


def main() -> None:
    path = sys.argv[1]
    f, notes, loads = parse(path)
    threads, filemap, siginfo = [], [], None
    for off, sz in notes:
        f.seek(off)
        data = f.read(sz)
        pos = 0
        while pos + 12 <= len(data):
            namesz, descsz, ntype = struct.unpack_from("<III", data, pos)
            pos += 12
            name = data[pos:pos + namesz].rstrip(b"\0")
            pos += align4(namesz)
            desc = data[pos:pos + descsz]
            pos += align4(descsz)
            if name == b"CORE" and ntype == 1:  # NT_PRSTATUS
                cursig, = struct.unpack_from("<h", desc, 12)
                pid, = struct.unpack_from("<i", desc, 32)
                regs = dict(zip(REGS, struct.unpack_from("<27Q", desc, 112)))
                threads.append((pid, cursig, regs))
            elif name == b"CORE" and ntype == 0x53494749:  # NT_SIGINFO
                signo, errno_, code = struct.unpack_from("<iii", desc, 0)
                addr, = struct.unpack_from("<Q", desc, 16)
                siginfo = (signo, code, addr)
            elif name == b"CORE" and ntype == 0x46494C45:  # NT_FILE
                count, _pg = struct.unpack_from("<QQ", desc, 0)
                p = 16
                ents = []
                for _ in range(count):
                    s, e, po = struct.unpack_from("<QQQ", desc, p)
                    ents.append((s, e, po))
                    p += 24
                strs = desc[p:].split(b"\0")
                for i in range(count):
                    filemap.append((*ents[i],
                                    strs[i].decode("utf-8", "replace")))

    def whereis(addr: int) -> str:
        for s, e, _po, n in filemap:
            if s <= addr < e:
                return f"{n} +{addr - s:#x}"
        return "unmapped/anon"

    def read_mem(addr: int, ln: int) -> bytes:
        for v, _msz, o, fsz in loads:
            if v <= addr < v + fsz:
                f.seek(o + (addr - v))
                return f.read(min(ln, v + fsz - addr))
        return b""

    signo, code, addr = siginfo
    print(f"siginfo: signo={signo} si_code={code} si_addr={addr:#x} "
          f"({whereis(addr)})")
    if code == -6:
        print("si_code=SI_TKILL: recorded signal is a re-raise; recovering "
              "original context from the handler's sigframe")
    for pid, cursig, regs in threads:
        if not cursig:
            continue
        print(f"\nthread pid={pid} cursig={cursig}")
        print(f"  rip={regs['rip']:#x} -> {whereis(regs['rip'])}")
        print(f"  rsp={regs['rsp']:#x} -> {whereis(regs['rsp'])}")
        base = regs["rsp"] & ~0xFFF
        buf = read_mem(base, 1 << 17)
        for i in range(0, len(buf) - 1100, 8):
            g = struct.unpack_from("<23Q", buf, i + 48)
            rip, rsp, trapno, err, cr2 = g[16], g[15], g[20], g[19], g[22]
            if trapno != 14 or whereis(rip) == "unmapped/anon":
                continue
            print(f"  sigframe @ {base + i:#x}: ORIGINAL fault")
            print(f"    rip={rip:#x} -> {whereis(rip)}")
            print(f"    rsp={rsp:#x} -> {whereis(rsp)}")
            print(f"    CR2(fault addr)={cr2:#x} err={err:#x} "
                  f"-> {whereis(cr2)}")
            ss = read_mem(rsp, 16384)
            shown = 0
            for j in range(0, len(ss) - 7, 8):
                val, = struct.unpack_from("<Q", ss, j)
                loc = whereis(val)
                if ".so" in loc or "python" in loc:
                    print(f"    [orig_rsp+{j:#06x}] {val:#x} {loc}")
                    shown += 1
                    if shown >= 30:
                        break
            break


if __name__ == "__main__":
    main()
