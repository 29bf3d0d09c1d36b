"""Can the tunnel's 60 s first-fetch handshake overlap compile traffic?

probe_first_fetch.py pinned the stall: the process's first device->host
transfer waits exactly ~60 s (connection-setup timeout), after which all
fetches run at line rate.  utils/device.py warm_transfer() pays it up
front on an idle tunnel.  This probe asks whether a DAEMON-THREAD warm
issued at t=0 completes while the main thread runs a fresh (uncached)
compile — if yes, the 60 s hides behind cold-start compiles and the warm
can move to import time in a background thread.

Run with a COLD compile cache for the scan (vary N below if rerunning).
"""
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 517  # odd size: not in the compile cache


def main():
    print(f"devices: {jax.devices()}", flush=True)
    warm_dt = {}

    def _warm():
        t0 = time.perf_counter()
        x = jnp.zeros((1,), jnp.float32)
        x.block_until_ready()
        np.asarray(x)
        warm_dt["s"] = time.perf_counter() - t0
        print(f"[warm thread] done in {warm_dt['s']:.3f}s", flush=True)

    th = threading.Thread(target=_warm, daemon=True)
    th.start()

    @jax.jit
    def big(x):
        def step(c, _):
            return jnp.tanh(c @ w), c[0, 0]
        w = jnp.eye(N, dtype=jnp.float32) * 0.99
        c, outs = jax.lax.scan(step, x, None, length=96)
        return c, outs

    t0 = time.perf_counter()
    c, outs = big(jnp.ones((N, N), jnp.float32))
    c.block_until_ready()
    print(f"[main] compile+run {time.perf_counter() - t0:.3f}s", flush=True)

    th.join()
    t0 = time.perf_counter()
    h = np.asarray(c)
    print(f"[main] fetch {h.nbytes/1e6:.1f} MB after warm "
          f"{time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
