"""Device-init watchdog: turn a hung TPU-tunnel init into an honest failure.

Over the axon tunnel, `jax.devices()` BLOCKS indefinitely when the remote side
is down or held by another client (the PJRT client init has no timeout). For
scoreboard/CI entry points that must terminate, wrap the first device touch
with `require_devices(...)`: if init does not complete within the deadline the
watchdog prints a machine-readable JSON error line and hard-exits (os._exit —
the hung init thread cannot be interrupted any other way).
"""

from __future__ import annotations

import json
import os
import sys
import threading

EXIT_DEVICE_INIT_TIMEOUT = 17


def require_devices(timeout_s: float | None = None, *, metric: str = "device_init"):
    """Block until jax.devices() returns, or hard-exit with a JSON error line.

    timeout_s defaults to env RECNEXT_DEVICE_INIT_TIMEOUT (seconds, 0 disables),
    else 600. Returns the device list on success."""
    import jax

    if timeout_s is None:
        timeout_s = float(os.environ.get("RECNEXT_DEVICE_INIT_TIMEOUT", "600"))
    if timeout_s <= 0:
        return jax.devices()

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            rec = {"metric": metric, "value": None, "unit": "error",
                   "vs_baseline": None,
                   "error": (f"jax device init did not complete within "
                             f"{timeout_s:.0f}s — TPU tunnel down or chip held "
                             f"by another client (single-client device)")}
            print(json.dumps(rec), flush=True)
            sys.stderr.write(rec["error"] + "\n")
            os._exit(EXIT_DEVICE_INIT_TIMEOUT)

    threading.Thread(target=watch, daemon=True).start()
    devices = jax.devices()
    done.set()
    return devices
