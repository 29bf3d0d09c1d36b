"""Isolate WHY the async warm stalled 439 s inside the pipeline (r4i run 1)
when probe_warm_variants measured zero stall 3/3.

Two differences between the contexts, one mode per process:

  async-immediate    copy_to_host_async then IMMEDIATE np.asarray (the
                     r4i warm_transfer code path) with nothing else
                     running.  Stall here => the blocking read arrives
                     before the async copy lands and falls into the
                     sync-timeout path; fix = delay the read.
  async-sleep        copy_to_host_async, sleep 3 s, then read.
  traffic-async      adapter-like traffic first (2 fresh compiles + an
                     8 MB H2D + dispatches), then async copy + sleep 3 s
                     + read.  Stall here => only the process's FIRST
                     transfer bypasses the timeout; fix = warm at import.

Pick fresh odd Ns when rerunning (compile cache).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:34s} {time.perf_counter() - t0:8.3f}s", flush=True)
    return out


def traffic(n):
    @jax.jit
    def f(x):
        def step(c, _):
            return jnp.tanh(c @ w), c[0, 0]
        w = jnp.eye(n, dtype=jnp.float32) * 0.99
        c, _ = jax.lax.scan(step, x, None, length=96)
        return c

    big_host = np.ones((1024, 2048), np.float32)  # 8 MB H2D
    d = jax.device_put(big_host)
    a = f(jnp.ones((n, n), jnp.float32))
    b = f(a * 1.001)
    (b.block_until_ready(), d.block_until_ready())
    return b


def main():
    mode, n = sys.argv[1], int(sys.argv[2])
    print(f"mode={mode} N={n} devices={jax.devices()}", flush=True)

    if mode == "traffic-async":
        t(f"traffic (2 compiles + H2D) N={n}", lambda: traffic(n))

    tiny = jnp.zeros((1,), jnp.float32)
    tiny.block_until_ready()
    t("copy_to_host_async dispatch", lambda: tiny.copy_to_host_async())
    if mode in ("async-sleep", "traffic-async"):
        time.sleep(3.0)
    t("np.asarray(tiny)", lambda: np.asarray(tiny))
    big = jnp.ones((512, 512), jnp.float32) * 2.0
    big.block_until_ready()
    t("fetch 1 MB", lambda: np.asarray(big))


if __name__ == "__main__":
    main()
