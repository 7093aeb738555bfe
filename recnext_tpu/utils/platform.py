"""Platform selection for CLIs under the site hook's TPU pin.

This environment pins ``jax_platforms`` to the TPU at interpreter start, so an
explicit ``JAX_PLATFORMS=cpu`` on the command line is silently ignored unless
re-applied via ``jax.config`` before first device use — and a CPU-intended tool
that fails to do so claims the SINGLE-CLIENT chip (blocking the real TPU job).
Every CLI calls this once before touching devices.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    """Re-apply an explicit JAX_PLATFORMS env var over the site hook's pin.

    No-op when the var is unset (the pinned platform stays in effect) or when
    jax.config rejects the update (e.g. devices already initialized)."""
    if os.environ.get("JAX_PLATFORMS"):
        try:
            import jax

            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
