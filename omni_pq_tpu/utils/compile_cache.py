"""Persistent XLA compilation cache.

The full train step takes ~4 min to compile on a v5e through the axon
tunnel; the persistent cache cuts warm recompiles ~17x (measured). Keyed on
the lowered module, so code changes invalidate naturally. Call before the
first jit compilation.

Pallas caveat (root-caused in round 3): the serialized Mosaic kernel payload
inside each tpu_custom_call embeds MLIR *location info for the full Python
call stack at trace time* when jax_include_full_tracebacks_in_locations is
on (the default). The cache key canonicalizes the outer module with
strip-debuginfo but cannot reach inside custom-call payload strings, so any
difference in how the program was LAUNCHED (a wrapper script, a different
entry-point file, even an edit that shifts line numbers in a caller on the
pallas trace path) changes the payload bytes and fragments the key — we
measured 73 distinct 74 MB cache entries for the same train step. enable()
therefore turns full tracebacks-in-locations off (kernel-level locations
remain; only the Python-stack frames go), which makes payloads — and keys —
depend only on the kernel code itself. OMNI_PQ_FULL_LOCATIONS=1 restores
full tracebacks (richer XLA error locations, fragmented cache).
"""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short tag identifying the host ISA feature set and jax version.

    XLA:CPU cache entries embed AOT-compiled machine code targeted at the
    compiling host's CPU features; a disk image moved to a different machine
    type then serves executables the new host can't run (cpu_aot_loader.cc
    'Machine type used for XLA:CPU compilation doesn't match ... could lead
    to SIGILL' — observed across round boxes with a shared 1.3 GB cache).
    Partitioning the cache directory by this fingerprint makes a foreign
    host start cold instead of loading foreign code.

    Residual cpu_aot_loader warnings on SAME-host loads are a false
    positive in XLA's comparison: the compile-time feature string embeds
    XLA's own tuning preferences (+prefer-no-scatter, +prefer-no-gather),
    which host feature detection never reports, so the lists can never
    match verbatim. Verified on this box (round 5): every real ISA bit
    (avx512*, amx-*) matches between the warning's two lists; only the
    prefer-* pseudo-features differ. Harmless — the loaded code targets
    this machine."""
    import jax
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1]
                                                   .split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{jax.__version__}|{feats}".encode()).hexdigest()[:12]
    return f"host-{h}"


def enable(cache_dir: str | None = None) -> None:
    import jax
    try:
        # repo-anchored default so the cache is shared regardless of the
        # launch directory (a cwd-anchored default fragments per entry point);
        # host-fingerprint subdir so entries never cross machine types
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = cache_dir or os.environ.get(
            "OMNI_PQ_COMPILE_CACHE", os.path.join(repo, ".jax_cache"))
        d = os.path.join(d, _host_fingerprint())
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        if os.environ.get("OMNI_PQ_FULL_LOCATIONS") != "1":
            jax.config.update("jax_include_full_tracebacks_in_locations",
                              False)
    except Exception:
        pass  # unwritable dir / old jax: run without the cache
