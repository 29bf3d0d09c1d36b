"""In-jit microbenches (scan x N inside one dispatch, so remote RTT is
amortized away): LN-stat variants and dense-vs-grouped conv."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IT = 50


def scan_timed(body, x0, label):
    @jax.jit
    def run(x, eps):
        def f(c, _):
            return body(c + eps.astype(c.dtype)), None
        out, _ = jax.lax.scan(f, x, None, length=N_IT)
        return jnp.float32(out.astype(jnp.float32).sum())

    float(run(x0, jnp.float32(0.0)))
    t0 = time.time()
    outs = [run(x0, jnp.float32(1e-6 * (i + 1))) for i in range(3)]
    acc = sum(float(o) for o in outs)
    dt = (time.time() - t0) / (3 * N_IT)
    print(f"{label}: {dt*1e3:.3f} ms/op (probe {acc:.2f})", flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 64, 128), jnp.bfloat16)

    eps_ln = 1e-5

    def ln_twopass(x):
        n_sp = x.shape[1] * x.shape[2] * x.shape[3]
        xf = x.astype(jnp.float32)
        s1 = xf.sum(axis=(1, 2, 3), keepdims=True)
        s2 = (xf * xf).sum(axis=(1, 2, 3), keepdims=True)
        mean = s1 / n_sp
        var = jnp.maximum(s2 / n_sp - mean * mean, 0.0)
        scale = jax.lax.rsqrt(var + eps_ln)
        return ((x - mean.astype(x.dtype)) * scale.astype(x.dtype))

    def ln_variadic(x):
        n_sp = x.shape[1] * x.shape[2] * x.shape[3]
        xf = x.astype(jnp.float32)
        s1, s2 = jax.lax.reduce(
            (xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
            lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2, 3),
        )
        mean = (s1 / n_sp)[:, None, None, None, :]
        var = jnp.maximum((s2 / n_sp)[:, None, None, None, :] - mean * mean, 0.0)
        scale = jax.lax.rsqrt(var + eps_ln)
        return ((x - mean.astype(x.dtype)) * scale.astype(x.dtype))

    scan_timed(ln_twopass, x, "LN two-reduce")
    scan_timed(ln_variadic, x, "LN variadic-reduce")

    # conv shapes as lowered by _Conv3DVia2D: (n*d, h, w, c) 2D convs
    xc = jax.random.normal(rng, (64, 64, 64, 128), jnp.bfloat16)
    kd = jax.random.normal(rng, (3, 3, 128, 128), jnp.bfloat16)
    kg = jax.random.normal(rng, (3, 3, 64, 128), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(xc.shape, kd.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_dense(x):
        return jax.lax.conv_general_dilated(
            x, kd, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

    def conv_grouped(x):
        return jax.lax.conv_general_dilated(
            x, kg, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            feature_group_count=2)

    scan_timed(conv_dense, xc, "conv2d 128->128 dense")
    scan_timed(conv_grouped, xc, "conv2d 128->128 grouped G=2")

    x2 = jax.random.normal(rng, (64, 64, 64, 256), jnp.bfloat16)
    kd2 = jax.random.normal(rng, (3, 3, 256, 256), jnp.bfloat16)
    kg2 = jax.random.normal(rng, (3, 3, 128, 256), jnp.bfloat16)
    dn2 = jax.lax.conv_dimension_numbers(x2.shape, kd2.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_dense2(x):
        return jax.lax.conv_general_dilated(
            x, kd2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn2)

    def conv_grouped2(x):
        return jax.lax.conv_general_dilated(
            x, kg2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn2,
            feature_group_count=2)

    scan_timed(conv_dense2, x2, "conv2d 256->256 dense")
    scan_timed(conv_grouped2, x2, "conv2d 256->256 grouped G=2")


if __name__ == "__main__":
    main()
