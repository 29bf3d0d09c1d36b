"""Device/tunnel runtime hygiene helpers.

The remote axon TPU tunnel stalls the FIRST device->host transfer of a
process for ~60 s (a connection-setup timeout: probe_first_fetch.py
measured exactly 60.001 s on a 32-byte fetch, after which a 2 MB fetch
runs in 0.2 s).  When that first fetch happens mid-pipeline with RPC
traffic in flight it multiplies (r4g measured 103-720 s on the voxelize
alphas fetch).  ``warm_transfer()`` pays the handshake once, up front,
on an idle tunnel with a 1-element array.

No reference counterpart: this is remote-runtime plumbing the reference's
local-GPU deployment (pixie/voxel/voxelize.py:17-141 runs on an attached
A100) never needed.
"""

from __future__ import annotations

import logging
import threading
import time

_log = logging.getLogger(__name__)
_warm_lock = threading.Lock()
_warmed = False


def warm_transfer() -> float:
    """Pay the tunnel's first-fetch handshake now, on a tiny payload.

    Idempotent per process; thread-safe; returns the seconds spent (0.0
    when already warmed).  Call before the first bulk device->host fetch
    — ideally right after backend init, before heavy dispatch traffic.
    On a local backend (CPU tests, real local devices) the fetch costs
    microseconds, so calling unconditionally is safe.
    """
    global _warmed
    with _warm_lock:
        if _warmed:
            return 0.0
        import jax.numpy as jnp  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        t0 = time.perf_counter()
        x = jnp.zeros((1,), jnp.float32)
        x.block_until_ready()
        np.asarray(x)
        dt = time.perf_counter() - t0
        _warmed = True
        if dt > 1.0:
            _log.info("first-fetch tunnel handshake took %.1f s "
                      "(paid up front; later fetches run at line rate)", dt)
        return dt
