"""Process-level runtime setup shared by all entry points."""

from __future__ import annotations

import os


def host_codegen_key() -> str:
    """Identity of THIS host as XLA:CPU's codegen sees it.

    XLA:CPU persists AOT-compiled machine code in the compilation cache,
    keyed (implicitly) by LLVM's host feature detection — which reads CPUID
    directly.  `/proc/cpuinfo` is the WRONG oracle for that: virtualized
    fleets can report one flag set in cpuinfo while CPUID (and therefore
    LLVM) sees another, so two hosts with identical cpuinfo text can
    generate incompatible code (the r4 dryrun loaded entries compiled with
    +amx-bf16 on a host without it — a SIGILL hazard).  This reads the same
    CPUID leaves LLVM's getHostCPUFeatures consults, via a 26-byte
    executable stub, and hashes them together with the jaxlib version (the
    LLVM embedded in XLA changes with it).  Falls back to cpuinfo flags on
    non-x86 or hardened kernels that refuse PROT_EXEC anonymous maps.
    """
    import hashlib
    import platform

    words = []
    if platform.machine() == "x86_64":
        try:
            import ctypes
            import mmap
            # void stub(u32 leaf /*edi*/, u32 sub /*esi*/, u32* out /*rdx*/)
            code = bytes([
                0x53,                          # push rbx
                0x49, 0x89, 0xD1,              # mov r9, rdx (out ptr)
                0x89, 0xF8,                    # mov eax, edi
                0x89, 0xF1,                    # mov ecx, esi
                0x0F, 0xA2,                    # cpuid
                0x41, 0x89, 0x01,              # mov [r9],    eax
                0x41, 0x89, 0x59, 0x04,        # mov [r9+4],  ebx
                0x41, 0x89, 0x49, 0x08,        # mov [r9+8],  ecx
                0x41, 0x89, 0x51, 0x0C,        # mov [r9+12], edx
                0x5B,                          # pop rbx
                0xC3,                          # ret
            ])
            buf = mmap.mmap(-1, mmap.PAGESIZE,
                            prot=mmap.PROT_READ | mmap.PROT_WRITE
                            | mmap.PROT_EXEC)
            buf.write(code)
            addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
            fn = ctypes.CFUNCTYPE(None, ctypes.c_uint32, ctypes.c_uint32,
                                  ctypes.POINTER(ctypes.c_uint32 * 4))(addr)
            out = (ctypes.c_uint32 * 4)()
            # the leaves LLVM's feature detection consults: basic ids,
            # feature bits (1), structured extended features (7.0/7.1 —
            # AVX-512*, AMX-*), XSAVE (0xD.1), extended (0x80000001)
            for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1), (0xD, 1),
                              (0x80000001, 0)):
                fn(leaf, sub, ctypes.byref(out))
                row = [int(w) for w in out]
                if leaf == 1:
                    # EBX[31:24] is the initial APIC id — varies by which
                    # core this runs on; keying on it would defeat
                    # same-host reuse
                    row[1] = 0
                words.extend(row)
            del fn
            buf.close()
        except Exception:
            words = []
    if not words:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        words = sorted(line.split(":")[1].split())
                        break
        except OSError:
            words = ["unknown"]
    try:
        import jaxlib
        ver = jaxlib.version.__version__
    except Exception:
        ver = "?"
    blob = ver + "|" + ",".join(str(w) for w in words)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def setup_jax_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache — XLA programs for the
    estimators take 20s-6min to compile through the axon tunnel; caching
    makes every CLI invocation after the first start hot."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/vatl4pose_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0: cache sub-second compiles too — the coreset greedy (~1 s compile)
    # sat right at the old 1.0 threshold and was flakily re-compiled cold
    # every process (BENCH_DETAIL coreset_select_s_cold)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return cache_dir
