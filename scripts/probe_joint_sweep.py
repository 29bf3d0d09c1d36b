"""Sweep the real JointMaterialUNet: batch sizes + a profiler trace."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.models.joint import JointMaterialUNet

GRID, FEAT = 64, 768


def build(batch):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, GRID, GRID, GRID, FEAT), jnp.bfloat16)
    net = JointMaterialUNet(dtype=jnp.bfloat16)
    p = net.init(rng, x)["params"]

    @jax.jit
    def fwd(p, x, eps):
        x = x + eps.astype(x.dtype)
        seg, cont = net.apply({"params": p}, x)
        return jnp.float32(seg.mean()) + jnp.float32(cont.mean())

    return fwd, p, x


def timed(fwd, p, x, label, iters=8):
    t0 = time.time()
    float(fwd(p, x, jnp.float32(0.0)))
    print(f"{label} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(iters):
        float(fwd(p, x, jnp.float32(1e-6 * (i + 1))))
    dt = (time.time() - t0) / iters
    b = x.shape[0]
    print(f"{label}: {dt*1e3:.1f} ms/batch{b} = {b/dt:.2f} grids/s", flush=True)
    return dt


def main():
    for batch in (1, 2, 4):
        fwd, p, x = build(batch)
        timed(fwd, p, x, f"joint-real b{batch}")
        if batch == 1:
            with jax.profiler.trace("/tmp/joint_trace"):
                for i in range(3):
                    float(fwd(p, x, jnp.float32(1e-6 * (i + 1))))
            print("trace written to /tmp/joint_trace", flush=True)
        del fwd, p, x


if __name__ == "__main__":
    main()
