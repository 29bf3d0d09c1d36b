"""Voxel-query variance probe: the 64^3 NerfField+FeatureField query bench
read 136.4 ms (r4 DESIGN), 160.2 ms (BENCH_r04), 228 ms (r5a) on identical
code — attribute the spread (device vs remote-dispatch vs run-to-run).

Runs the same jitted query 8x with varied inputs in ONE process and prints
each timing plus a dispatch-only (no fetch) pass.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from pixie_tpu.recon.field import FeatureField, NerfField

    nerf, feat = NerfField(), FeatureField()
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    params = {
        "nerf": nerf.init(rng, dummy, jnp.zeros((8, 3)), False),
        "feat": feat.init(jax.random.fold_in(rng, 7), dummy),
    }

    @jax.jit
    def query(p, pts):
        return nerf.apply(p["nerf"], pts, None, True), \
            feat.apply(p["feat"], pts)

    side = 64
    grid = np.stack(
        np.meshgrid(*[np.linspace(0, 1, side, dtype=np.float32)] * 3,
                    indexing="ij"), axis=-1).reshape(-1, 3)
    t0 = time.time()
    d, _ = query(params, jnp.asarray(grid))
    float(jnp.sum(d))
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    for r in range(8):
        t0 = time.time()
        d, f = query(params, jnp.asarray(grid) + np.float32(1e-4 * (r + 1)))
        s = float(jnp.sum(d))  # forced by scalar VALUE fetch
        print(f"  rep {r}: {1e3 * (time.time() - t0):8.1f} ms (probe {s:.2f})",
              flush=True)

    # dispatch-only (enqueue 8, then force all): device-time estimate
    t0 = time.time()
    outs = [query(params, jnp.asarray(grid) + np.float32(1e-3 * (r + 1)))
            for r in range(8)]
    acc = sum(float(jnp.sum(d)) for d, _ in outs)
    print(f"pipelined 8x: {1e3 * (time.time() - t0) / 8:.1f} ms/rep "
          f"(probe {acc:.2f})", flush=True)


if __name__ == "__main__":
    main()
