"""Pin down the first-fetch stall on the remote axon TPU tunnel.

probe_fetch_shapes.py (r4g) killed the narrow-minor-dim theory: the ONLY
slow fetch was the first device->host transfer of the process (66 s for
2 MB); every subsequent fetch of every shape ran at ~25 MB/s.  Pipeline
evidence says the stall scales with prior dispatched work (packed scan:
103-191 s; 192-dispatch loop: 720 s).  This probe separates, in order:

  1. tiny fetch immediately after backend init   (fixed-handshake cost?)
  2. dispatch of a big 192-step scan program     (voxel-query analog)
  3. block_until_ready on its output             (device execution?)
  4. tiny fetch after the scan                   (per-program drain?)
  5. 2 MB (T,4) fp16 fetch                       (the pipeline's stall)

If (1) absorbs the stall -> fixed handshake: warm the tunnel with a
1-element fetch at process start.  If (4) stalls -> the scan's execution
or artifact shipping is the cost and block_until_ready lies.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

T = 262144


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt:8.3f}s", flush=True)
    return out


@jax.jit
def big_scan(x):
    def step(carry, _):
        carry = jnp.tanh(carry @ w)
        return carry, carry[0, :4].astype(jnp.float16)

    w = jnp.eye(512, dtype=jnp.float32) * 0.99
    carry, rows = jax.lax.scan(step, x, None, length=192)
    alphas = jnp.broadcast_to(rows.reshape(-1)[:4], (T, 4))
    return carry, alphas.astype(jnp.float16)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tiny = jnp.zeros((8,), jnp.float32)
    t("0 tiny dispatch+ready", lambda: tiny.block_until_ready())
    t("1 FIRST tiny fetch", lambda: np.asarray(tiny))

    x = jnp.ones((512, 512), jnp.float32)
    carry, alphas = t("2 scan dispatch (compile incl.)", lambda: big_scan(x))
    t("3 block_until_ready(alphas)", lambda: alphas.block_until_ready())
    t("4 tiny fetch after scan", lambda: np.asarray(tiny))
    t("5 fetch (T,4) fp16 2MB", lambda: np.asarray(alphas))
    t("6 fetch carry 1MB", lambda: np.asarray(carry))

    # second round with fresh values: is any of it per-program recurring?
    x2 = x * 1.001
    carry2, alphas2 = t("7 scan dispatch (cached)", lambda: big_scan(x2))
    t("8 block_until_ready(alphas2)", lambda: alphas2.block_until_ready())
    t("9 fetch (T,4) fp16 2MB again", lambda: np.asarray(alphas2))


if __name__ == "__main__":
    main()
