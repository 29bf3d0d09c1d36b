"""Device/tunnel runtime hygiene helpers.

The remote axon TPU tunnel stalls the first BLOCKING device->host
transfer of a process for 60+ s (probe_first_fetch.py: exactly 60.001 s
on a 32-byte fetch with an idle tunnel, 89-720 s when racing in-flight
RPC traffic; r5a recorded a 1477 s outlier).  Every later fetch runs at
12-27 MB/s line rate.  The stall is a pathology of the *synchronous*
first fetch only: issuing a 1-element ``copy_to_host_async()`` as the
first transfer skips the timeout path (probe_warm_variants.py: ZERO
stall, 3/3 processes, vs 89 s no-warm and 124 s sync-warm) — PROVIDED
nothing blocks on it until real work has run.  The r4 ``warm_transfer``
joined the async copy immediately, which re-serialized the whole
handshake onto the caller (r5a run 2: 1477 s inside voxelize).

Use ``warm_dispatch()`` as early as possible (first thing after the jax
import in a CLI); the handshake then completes in the background behind
compiles/queries.  ``warm_transfer()`` joins a pending dispatch (issuing
one first if needed) and returns the seconds IT waited — call it right
before the first bulk fetch.

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
_pending = None  # dispatched-but-unjoined warm buffer


def warm_dispatch() -> None:
    """Issue the tiny ``copy_to_host_async`` WITHOUT waiting on it.

    Call as the process's first device action; the tunnel handshake then
    runs in the background behind subsequent compiles/queries instead of
    stalling the first bulk fetch.  Idempotent; thread-safe."""
    global _pending
    with _warm_lock:
        if _warmed or _pending is not None:
            return
        import jax.numpy as jnp  # noqa: PLC0415

        x = jnp.zeros((1,), jnp.float32)
        x.copy_to_host_async()
        _pending = x


def warm_transfer() -> float:
    """Ensure the tunnel's device->host path is open; returns seconds
    spent WAITING here (0.0 when already warmed, ~0 when a prior
    ``warm_dispatch`` already hid the handshake).  Call before the first
    bulk device->host fetch.  Safe on any backend (CPU: microseconds)."""
    global _warmed, _pending
    with _warm_lock:
        if _warmed:
            return 0.0
        import numpy as np  # noqa: PLC0415

        t0 = time.perf_counter()
        if _pending is None:
            import jax.numpy as jnp  # noqa: PLC0415

            x = jnp.zeros((1,), jnp.float32)
            x.copy_to_host_async()
            _pending = x
        np.asarray(_pending)  # join: reads the async-copied buffer
        _pending = None
        dt = time.perf_counter() - t0
        _warmed = True
        if dt > 1.0:
            _log.info("first-fetch tunnel handshake cost %.1f s at the join "
                      "(dispatch warm_dispatch() earlier to hide it)", dt)
        return dt
