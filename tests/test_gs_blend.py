"""Unit tests for the fused Pallas tile-blend kernel (ops/gs_blend.py):
forward parity and analytic-VJP agreement against an XLA reference
implementation of the same compositing math (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.ops.gs_blend import ROWS_IN, blend_tiles

T, C, CHUNK, TXN = 9, 256, 128, 3


@pytest.fixture(scope="module")
def splats():
    rng = np.random.default_rng(0)
    g = np.zeros((T, ROWS_IN, C), np.float32)
    tx = np.arange(T) % TXN
    ty = np.arange(T) // TXN
    g[:, 0] = (tx * 16)[:, None] + rng.uniform(-4, 20, (T, C))
    g[:, 1] = (ty * 16)[:, None] + rng.uniform(-4, 20, (T, C))
    g[:, 2] = rng.uniform(0.005, 0.08, (T, C))
    g[:, 3] = rng.uniform(-0.01, 0.01, (T, C))
    g[:, 4] = rng.uniform(0.005, 0.08, (T, C))
    g[:, 5:8] = rng.uniform(0, 1, (T, 3, C))
    g[:, 8] = rng.uniform(0, 1.2, (T, C))  # some opacities clamp at 0.99
    return jnp.asarray(g)


def ref_blend(g16):
    """Straight-line XLA version of the kernel's compositing math."""
    t_ids = jnp.arange(T)
    px = jnp.arange(16, dtype=jnp.float32) + 0.5
    pix_x = jnp.broadcast_to(
        (((t_ids % TXN) * 16)[:, None, None] + px[None, None, :]).astype(
            jnp.float32), (T, 16, 16))
    pix_y = jnp.broadcast_to(
        (((t_ids // TXN) * 16)[:, None, None] + px[None, :, None]).astype(
            jnp.float32), (T, 16, 16))
    color = jnp.zeros((T, 16, 16, 3))
    trans = jnp.ones((T, 16, 16))
    for k in range(C // CHUNK):
        sl = slice(k * CHUNK, (k + 1) * CHUNK)
        m_x, m_y = g16[:, 0, sl], g16[:, 1, sl]
        cn0, cn1, cn2 = g16[:, 2, sl], g16[:, 3, sl], g16[:, 4, sl]
        col = g16[:, 5:8, sl]
        o = g16[:, 8, sl]
        dx = pix_x[..., None] - m_x[:, None, None, :]
        dy = pix_y[..., None] - m_y[:, None, None, :]
        power = (-0.5 * (cn0[:, None, None, :] * dx * dx
                         + cn2[:, None, None, :] * dy * dy)
                 - cn1[:, None, None, :] * dx * dy)
        alpha = jnp.minimum(
            o[:, None, None, :] * jnp.exp(jnp.minimum(power, 0.0)), 0.99)
        alpha = jnp.where(alpha < 1 / 255.0, 0.0, alpha)
        om = 1.0 - alpha
        cum = jnp.cumprod(om, axis=-1)
        w = alpha * (cum / om) * trans[..., None]
        color = color + jnp.stack(
            [jnp.sum(w * col[:, e][:, None, None, :], -1) for e in range(3)],
            -1)
        trans = trans * cum[..., -1]
    return color, trans


def _kernel_outputs(g):
    out = blend_tiles(g, TXN, CHUNK, True)
    color = jnp.moveaxis(out[:, :3, :], 1, -1).reshape(T, 16, 16, 3)
    trans = out[:, 3, :].reshape(T, 16, 16)
    return color, trans


def test_forward_parity(splats):
    c_k, t_k = _kernel_outputs(splats)
    c_r, t_r = ref_blend(splats)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_r),
                               atol=1e-5, rtol=1e-5)


def test_vjp_matches_xla_autodiff(splats):
    def loss_k(g):
        c, t = _kernel_outputs(g)
        return (c * 1.7).sum() + (t * 0.3).sum()

    def loss_r(g):
        c, t = ref_blend(g)
        return (c * 1.7).sum() + (t * 0.3).sum()

    g_k = jax.grad(loss_k)(splats)
    g_r = jax.grad(loss_r)(splats)
    err = np.abs(np.asarray(g_k) - np.asarray(g_r))
    rel = err / (np.abs(np.asarray(g_r)) + 1e-3)
    assert rel.max() < 1e-3, f"max rel grad err {rel.max():.2e}"


def test_fully_transparent_tile(splats):
    g = splats.at[:, 8, :].set(0.0)  # zero opacity everywhere
    c, t = _kernel_outputs(g)
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-7)


def test_opaque_front_splat_blocks_rest(splats):
    # enormous first splat with near-max opacity at every tile center
    tx = jnp.arange(T) % TXN
    ty = jnp.arange(T) // TXN
    g = splats
    g = g.at[:, 0, 0].set(tx * 16.0 + 8.0)
    g = g.at[:, 1, 0].set(ty * 16.0 + 8.0)
    g = g.at[:, 2, 0].set(1e-6)
    g = g.at[:, 3, 0].set(0.0)
    g = g.at[:, 4, 0].set(1e-6)
    g = g.at[:, 8, 0].set(10.0)   # clamps to 0.99
    c, t = _kernel_outputs(g)
    # transmittance after a 0.99-alpha front splat is <= 0.01 everywhere
    assert float(np.asarray(t).max()) <= 0.011
