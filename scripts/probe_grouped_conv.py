"""Probe: XLA grouped conv (feature_group_count=2) vs block-diagonal dense
conv on TPU, at the joint-net's hot shapes; plus pipelined-dispatch timing.

Block-diag kernels compute the zero blocks (2x the useful FLOPs); grouped
convs skip them IF XLA lowers groups efficiently on TPU.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_pipelined(fn, args_list, label):
    # warmup
    float(jnp.sum(fn(*args_list[0])))
    t0 = time.time()
    outs = [fn(*a) for a in args_list]
    acc = sum(float(jnp.sum(o)) for o in outs)
    dt = (time.time() - t0) / len(args_list)
    print(f"{label}: {dt*1e3:.2f} ms (pipelined x{len(args_list)}, probe {acc:.2f})",
          flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    # hot shape: 64^3 spatial, 128->128 joint channels (2D-decomposed tap:
    # batch 64 slices of (64,64))
    n, hw, ci, co = 64, 64, 128, 128
    xs = [jax.random.normal(jax.random.PRNGKey(i), (n, hw, hw, ci), jnp.bfloat16)
          for i in range(8)]

    kd = jax.random.normal(rng, (3, 3, ci, co), jnp.bfloat16)      # dense
    kg = jax.random.normal(rng, (3, 3, ci // 2, co), jnp.bfloat16)  # grouped

    dn = jax.lax.conv_dimension_numbers((n, hw, hw, ci), (3, 3, ci, co),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def dense(x):
        return jax.lax.conv_general_dilated(x, kd, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn)

    @jax.jit
    def grouped(x):
        return jax.lax.conv_general_dilated(x, kg, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn,
                                            feature_group_count=2)

    timed_pipelined(dense, [(x,) for x in xs], "dense 128->128 3x3 2D")
    timed_pipelined(grouped, [(x,) for x in xs], "grouped G=2 128->128")

    # decoder shape 256->128
    ci2 = 256
    xs2 = [jax.random.normal(jax.random.PRNGKey(i), (n, hw, hw, ci2), jnp.bfloat16)
           for i in range(8)]
    kd2 = jax.random.normal(rng, (3, 3, ci2, co), jnp.bfloat16)
    kg2 = jax.random.normal(rng, (3, 3, ci2 // 2, co), jnp.bfloat16)
    dn2 = jax.lax.conv_dimension_numbers((n, hw, hw, ci2), (3, 3, ci2, co),
                                         ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def dense2(x):
        return jax.lax.conv_general_dilated(x, kd2, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn2)

    @jax.jit
    def grouped2(x):
        return jax.lax.conv_general_dilated(x, kg2, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn2,
                                            feature_group_count=2)

    timed_pipelined(dense2, [(x,) for x in xs2], "dense 256->128 3x3 2D")
    timed_pipelined(grouped2, [(x,) for x in xs2], "grouped G=2 256->128")

    # full joint net, pipelined dispatch (device throughput, honest force)
    from pixie_tpu.models.joint import JointMaterialUNet

    net = JointMaterialUNet(dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (1, 64, 64, 64, 768), jnp.bfloat16)
    p = net.init(rng, x)["params"]

    @jax.jit
    def fwd(p, x, eps):
        x = x + eps.astype(x.dtype)
        seg, cont = net.apply({"params": p}, x)
        return jnp.float32(seg.mean()) + jnp.float32(cont.mean())

    float(fwd(p, x, jnp.float32(0.0)))
    t0 = time.time()
    outs = [fwd(p, x, jnp.float32(1e-6 * (i + 1))) for i in range(10)]
    acc = sum(float(o) for o in outs)
    dt = (time.time() - t0) / 10
    print(f"joint pipelined: {dt*1e3:.1f} ms = {1/dt:.2f} grids/s (probe {acc:.3f})",
          flush=True)


if __name__ == "__main__":
    main()
