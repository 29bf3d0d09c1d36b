"""Probe raw device->host tunnel bandwidth on the remote TPU.

Measures jax.device_get throughput for various payload sizes and dtypes
(reference for docs/DESIGN.md tunnel-bandwidth entries; the voxelize
sparse fetch at HEAD measured 0.44 MB/s for fp16 chunks vs a 4 MB/s
earlier idle read -> is the tunnel itself variable, or is the chunked
fetch path leaving bandwidth on the table?).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(label, arr, reps=3):
    arr.block_until_ready()
    mb = arr.size * arr.dtype.itemsize / 1e6
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(arr)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:28s} {mb:8.1f} MB  best {best:7.3f}s  "
          f"{mb / best:7.2f} MB/s  all={[round(t, 3) for t in times]}",
          flush=True)
    return mb / best


def main():
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)
    f32 = jax.random.normal(key, (1 << 20,))  # 4 MB
    probe("f32 4MB", f32)
    for size_mb, n in [(1, 1 << 19), (8, 1 << 22), (32, 1 << 24),
                       (128, 1 << 26)]:
        x = jax.random.normal(key, (n,), dtype=jnp.float32)
        probe(f"f32 {size_mb}MB", x.astype(jnp.float16))
        probe(f"f32 {size_mb}MB (raw f32)", x) if size_mb <= 32 else None
    x8 = (jax.random.normal(key, (1 << 25,)) * 10).astype(jnp.int8)  # 32 MB
    probe("int8 32MB", x8)
    # the voxelize fetch shape: chunked (16384, 768) fp16 parts
    fd = jax.random.normal(key, (87655, 768), dtype=jnp.float32)
    fd16 = fd.astype(jnp.float16)
    fd16.block_until_ready()
    t0 = time.perf_counter()
    ck = 16384
    npad = (87655 + ck - 1) // ck * ck
    pad = jnp.zeros((npad - 87655, 768), jnp.float16)
    fdp = jnp.concatenate([fd16, pad], axis=0)
    parts = [jax.lax.dynamic_slice_in_dim(fdp, i, ck, axis=0)
             for i in range(0, npad, ck)]
    rows = np.concatenate([np.asarray(p) for p in parts], axis=0)
    dt = time.perf_counter() - t0
    mb = rows.size * 2 / 1e6
    print(f"voxelize-shape chunked fetch {mb:.1f} MB in {dt:.2f}s = "
          f"{mb / dt:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
