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


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache at `path` (or the
    RECNEXT_COMPILE_CACHE env var). Returns the cache dir, or None if unset.
    Must be called before the first jit execution to benefit it."""
    import jax

    path = path or os.environ.get("RECNEXT_COMPILE_CACHE")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the default thresholds skip small/fast compiles, but a
    # serving restart wants all of them back
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
