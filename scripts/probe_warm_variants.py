"""Handshake-hiding variants, one mode per process (handshake is per-process).

Modes (argv[1]):
  compile-only N   fresh scan compile alone, then first fetch  (control:
                   what does the compile cost with no warm racing it, and
                   does the handshake still cost 60 s after a compile?)
  async-first N    tiny copy_to_host_async() as the VERY FIRST device
                   action, then fresh compile, then fetches — does the
                   async copy pay the handshake in the background without
                   serializing the compile RPCs?
  sync-first N     sync warm fetch first (idle tunnel), then fresh
                   compile, then fetches — the utils/device.py strategy.

Pick a fresh odd N per invocation: a cached compile invalidates the race.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:30s} {time.perf_counter() - t0:8.3f}s", flush=True)
    return out


def fresh_compile(n):
    @jax.jit
    def big(x):
        def step(c, _):
            return jnp.tanh(c @ w), c[0, 0]
        w = jnp.eye(n, dtype=jnp.float32) * 0.99
        c, outs = jax.lax.scan(step, x, None, length=96)
        return c, outs

    c, _ = big(jnp.ones((n, n), jnp.float32))
    c.block_until_ready()
    return c


def main():
    mode, n = sys.argv[1], int(sys.argv[2])
    print(f"mode={mode} N={n} devices={jax.devices()}", flush=True)
    tiny = jnp.zeros((1,), jnp.float32)
    tiny.block_until_ready()

    if mode == "async-first":
        t("copy_to_host_async dispatch", lambda: tiny.copy_to_host_async())
    elif mode == "sync-first":
        t("sync warm fetch", lambda: np.asarray(tiny))

    c = t(f"fresh compile+run N={n}", lambda: fresh_compile(n))
    t("first/next sync fetch tiny", lambda: np.asarray(tiny))
    t("fetch carry", lambda: np.asarray(c))


if __name__ == "__main__":
    main()
