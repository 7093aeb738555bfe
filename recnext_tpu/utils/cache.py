"""Persistent XLA compilation cache for serving/bench cold-starts.

First compile of a full model on TPU is 2-4 minutes (PERF.md); a deployment
that restarts its serving process pays that every time. JAX's persistent
compilation cache stores the compiled executable keyed by (HLO, compiler
flags, platform) so a warm restart loads it in seconds.

Enable with `--compile-cache DIR` on bench.py / validate.py, or the
RECNEXT_COMPILE_CACHE env var for any entry point.

No reference counterpart (torch eager has no compile step to cache); this is
TPU-deployment plumbing.
"""

from __future__ import annotations

import os
from typing import Optional


def machine_key() -> str:
    """Stable fingerprint of THIS host's CPU microarchitecture (arch + model +
    ISA feature flags). XLA:CPU ahead-of-time executables are machine-code and
    are NOT portable across microarchitectures — reusing a cache dir written on
    a different machine produces "Machine type used for XLA:CPU compilation
    doesn't match the machine type of the loader... could lead to SIGILL"
    loader errors (observed in MULTICHIP_r04.json when the driver replayed the
    repo-local .xla_cache on a different box). Keying the cache dir by this
    fingerprint makes a foreign cache invisible instead of a latent SIGILL."""
    import hashlib
    import platform as _platform

    parts = [_platform.machine(), _platform.system()]
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags", "Features") and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
    except OSError:
        pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache at `path` (or the
    RECNEXT_COMPILE_CACHE env var). Returns the cache dir, or None if unset.
    Must be called before the first jit execution to benefit it.

    The actual cache lives in a per-machine subdirectory (see `machine_key`):
    one shared `path` across heterogeneous hosts (driver box, CI, this host)
    never replays another microarchitecture's AOT machine code."""
    import jax

    path = path or os.environ.get("RECNEXT_COMPILE_CACHE")
    if not path:
        return None
    path = os.path.join(path, machine_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the default thresholds skip small/fast compiles, but a
    # serving restart wants all of them back
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
