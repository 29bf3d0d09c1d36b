"""Probe device->host fetch cost vs ARRAY SHAPE on the remote TPU tunnel.

Motivation (r4g): fetching ~2 MB of packed alphas+rgb as a (262144, 4)
fp16 array stalls 35-191 s across tunnel windows, while probe_tunnel.py
measured 12-23 MB/s on 1-D and (16384, 768) buffers.  Hypothesis: narrow
minor dims lane-pad to 128 on device and the tunnel serializes the PADDED
layout — (T, 4) fp16 would move 64 MB for a 2 MB logical payload.

Each variant is fetched fresh (inputs varied per rep so dispatch dedup
can't cache), interleaved across reps so a drifting tunnel window affects
all shapes equally.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

T = 262144


@jax.jit
def _make(seed):
    x = jax.random.normal(jax.random.PRNGKey(seed), (T, 4), jnp.float32)
    return x.astype(jnp.float16)


VARIANTS = {
    "(T,4) fp16": lambda a: a,
    "(T,1) fp16": lambda a: a[:, :1],
    "flat (4T,) fp16": lambda a: a.reshape(-1),
    "(8T/128,128) fp16": lambda a: a.reshape(-1, 128),
    "(4T/1024,1024) fp16": lambda a: a.reshape(-1, 1024),
    "(T,4)->f32": lambda a: a.astype(jnp.float32),
}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for rep in range(3):
        for name, fn in VARIANTS.items():
            a = _make(rep * 31 + hash(name) % 1000)
            out = fn(a)
            out.block_until_ready()
            t0 = time.perf_counter()
            h = np.asarray(out)
            dt = time.perf_counter() - t0
            results[name].append(dt)
            mb = h.size * h.dtype.itemsize / 1e6
            print(f"rep{rep} {name:22s} {mb:6.1f} MB  {dt:8.3f}s  "
                  f"{mb / max(dt, 1e-9):8.2f} MB/s", flush=True)
    print("--- best-of-3 ---", flush=True)
    for name, ts in results.items():
        print(f"{name:22s} best {min(ts):8.3f}s", flush=True)


if __name__ == "__main__":
    main()
