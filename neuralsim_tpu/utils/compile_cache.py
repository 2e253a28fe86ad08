"""Host-aware persistent-compile-cache setup.

XLA:CPU cache entries are AOT machine code compiled for the exact host ISA;
loading one written on a different machine (this image migrates between
hosts) trips ``cpu_aot_loader`` feature-mismatch and can SIGILL/SEGV the
process mid-`backend_compile_and_load`. TPU entries are device code and are
host-independent. So: CPU processes get a per-host-ISA subdirectory keyed by
the /proc/cpuinfo flags hash; every other backend shares the plain dir.
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional


def _host_isa_key() -> str:
    # Key on flags AND model/vendor: LLVM target features baked into AOT
    # entries (e.g. +prefer-no-scatter) are chosen per MICROARCHITECTURE,
    # so hosts with identical flag sets can still produce incompatible
    # entries (observed: feature-mismatch E-logs from cpu_aot_loader).
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name", "vendor_id",
                                    "cpu family", "model\t", "stepping")):
                    parts.append(line.strip())
                if line.startswith("power management"):  # end of first core
                    break
    except OSError:
        pass
    if not parts:
        return "unknown"
    return hashlib.sha1("\n".join(sorted(set(parts))).encode()).hexdigest()[:10]


def setup_compile_cache(path: Optional[str] = ".jax_cache") -> Optional[str]:
    """Point jax's persistent cache at ``path`` (no-op if falsy), isolating
    CPU-backend entries per host ISA. Call after the platform is forced."""
    if not path or os.environ.get("NEURALSIM_NO_COMPILE_CACHE"):
        return None
    import jax

    path = os.path.abspath(path)
    if jax.default_backend() == "cpu":
        path = os.path.join(path, f"cpu-{_host_isa_key()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
