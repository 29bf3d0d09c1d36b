"""Device/tunnel runtime hygiene helpers.

The remote axon TPU tunnel stalls the first BLOCKING device->host
transfer of a process for 60+ s (probe_first_fetch.py: exactly 60.001 s
on a 32-byte fetch with an idle tunnel, 89-720 s when racing in-flight
RPC traffic; every later fetch runs at 12-27 MB/s line rate).  The stall
is a pathology of the *synchronous* first fetch only: issuing a
1-element ``copy_to_host_async()`` as the first transfer skips the
timeout path entirely — probe_warm_variants.py measured ZERO stall,
3/3 processes, vs 89 s (no warm) and 124 s (sync warm).
``warm_transfer()`` applies that: call it before any bulk fetch.

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
    """Open the tunnel's device->host path via a tiny ASYNC copy.

    The first *blocking* fetch of a process hits a 60+ s timeout; a
    1-element ``copy_to_host_async`` first transfer avoids it entirely
    (module docstring).  Idempotent per process; thread-safe; returns the
    seconds spent (~0; 0.0 when already warmed).  Call before the first
    bulk device->host fetch.  Safe on any backend (CPU tests: microseconds).
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
        x.copy_to_host_async()
        np.asarray(x)  # instant: reads the async-copied buffer
        dt = time.perf_counter() - t0
        _warmed = True
        if dt > 1.0:
            _log.info("first-fetch tunnel handshake took %.1f s "
                      "(paid up front; later fetches run at line rate)", dt)
        return dt
