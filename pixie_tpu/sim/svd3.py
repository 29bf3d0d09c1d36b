"""Batched branch-free 3x3 SVD for TPU.

The reference solver calls Warp's ``wp.svd3`` per particle per substep
(mpm_utils.py:94,145,202,249,501).  Warp uses a McAdams-style iterative SVD
whose convention is: U and V are proper rotations and the smallest singular
value carries the sign of det(F).  We reproduce that convention with a
cyclic-Jacobi eigendecomposition of F^T F — fully vectorized, branch-free
(jnp.where only), fp32-stable.

All 3x3 products are unrolled elementwise (pixie_tpu.sim.mat3): on TPU,
batched (N,3,3) einsums pad 3 -> 128 on the MXU (~1800x wasted FLOPs,
measured ~140ms/substep at N=100k); the unrolled form stays on the VPU
and fuses with surrounding math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixie_tpu.sim import mat3
from pixie_tpu.sim.mat3 import det3  # noqa: F401  (re-exported for solver use)

_EPS = 1e-12


def _jacobi_rotation(app, aqq, apq):
    """Stable symmetric Schur rotation (c, s) annihilating apq."""
    safe_apq = jnp.where(jnp.abs(apq) < _EPS, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau==0 -> 45 degree rotation
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    trivial = jnp.abs(apq) < _EPS
    c = jnp.where(trivial, 1.0, c)
    s = jnp.where(trivial, 0.0, s)
    return c, s


def _eigh3(s_mat: jnp.ndarray, sweeps: int = 5):
    """Cyclic Jacobi eigendecomposition of batched symmetric 3x3 matrices.

    Returns (eigvals (N,3), eigvecs (N,3,3)) with S = V diag(w) V^T, unsorted.
    """
    s = s_mat
    v = jnp.broadcast_to(jnp.eye(3, dtype=s_mat.dtype), s_mat.shape)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            c, sn = _jacobi_rotation(s[..., p, p], s[..., q, q], s[..., p, q])
            s, v = mat3.rotate_pq(s, v, c, sn, p, q)
    w = jnp.stack([s[..., 0, 0], s[..., 1, 1], s[..., 2, 2]], axis=-1)
    return w, v


def _norm3(x, keepdims=False):
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=keepdims))


def _normalize(x):
    return x / jnp.maximum(_norm3(x, keepdims=True), _EPS)


def _cross(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def svd3(f: jnp.ndarray, sweeps: int = 5):
    """Batched SVD of (N,3,3) with Warp's wp.svd3 conventions.

    Returns (u, sigma, v) with f = u @ diag(sigma) @ v^T, u and v proper
    rotations, sigma sorted descending, and sigma[2] carrying sign(det f).
    """
    ft_f = mat3.matmul_tn(f, f)
    w, v = _eigh3(ft_f, sweeps=sweeps)

    # Sort eigenpairs descending with a branch-free 3-element sorting network
    # (argsort + take_along_axis lowers to slow small-axis gathers on TPU).
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    v0, v1, v2 = v[..., :, 0], v[..., :, 1], v[..., :, 2]

    def cswap(wa, va, wb, vb):
        swap = (wa < wb)
        sw = swap[..., None]
        return (
            jnp.where(swap, wb, wa), jnp.where(sw, vb, va),
            jnp.where(swap, wa, wb), jnp.where(sw, va, vb),
        )

    w0, v0, w1, v1 = cswap(w0, v0, w1, v1)
    w0, v0, w2, v2 = cswap(w0, v0, w2, v2)
    w1, v1, w2, v2 = cswap(w1, v1, w2, v2)
    w = jnp.stack([w0, w1, w2], axis=-1)

    # Make V a proper rotation: re-orthonormalize (Gram-Schmidt + cross
    # completion).  For (near-)degenerate eigenvalues the fused Jacobi can
    # drift V off orthogonality (observed on XLA:CPU as duplicated columns
    # inside larger fusion contexts); a non-rotation V makes the sand
    # projection u v^T singular -> log(0) -> NaN.  v2 = v0 x v1 also gives
    # det(V) = +1 by construction (replacing the sign flip).
    v0 = _normalize(v0)
    v1 = v1 - jnp.sum(v1 * v0, axis=-1, keepdims=True) * v0
    exv = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], f.dtype), v0.shape)
    eyv = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], f.dtype), v0.shape)
    alt_v = _cross(v0, exv)
    alt_v = jnp.where(_norm3(alt_v, keepdims=True) < 1e-6, _cross(v0, eyv), alt_v)
    v1 = jnp.where(
        _norm3(v1, keepdims=True) < 1e-6, _normalize(alt_v), _normalize(v1)
    )
    v2 = _cross(v0, v1)
    v = jnp.stack([v0, v1, v2], axis=-1)

    sigma = jnp.sqrt(jnp.maximum(w, 0.0))

    # U columns: normalize F v_i, with orthogonal completion for tiny sigma.
    fv = mat3.matmul(f, v)  # columns are F v_i
    u0 = _normalize(fv[..., :, 0])
    u1_raw = fv[..., :, 1]
    u1_raw = u1_raw - jnp.sum(u1_raw * u0, axis=-1, keepdims=True) * u0
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], f.dtype), u0.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], f.dtype), u0.shape)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], f.dtype), u0.shape)
    alt = _cross(u0, ex)
    alt = jnp.where(_norm3(alt, keepdims=True) < 1e-6, _cross(u0, ey), alt)
    u1 = jnp.where(
        _norm3(u1_raw, keepdims=True) < 1e-6 * jnp.maximum(sigma[..., :1], 1e-6),
        _normalize(alt),
        _normalize(u1_raw),
    )
    u2 = _cross(u0, u1)  # right-handed: guarantees det(U) = +1
    tiny = (sigma[..., 0] < 1e-10)[..., None]
    u0 = jnp.where(tiny, ex, u0)
    u1 = jnp.where(tiny, ey, u1)
    u2 = jnp.where(tiny, ez, u2)
    u = jnp.stack([u0, u1, u2], axis=-1)

    # sigma[2] takes sign(det F) so that U, V are both rotations (Warp's
    # convention).
    det_f = det3(f)
    s2 = sigma[..., 2] * jnp.where(det_f < 0.0, -1.0, 1.0)
    sigma = jnp.stack([sigma[..., 0], sigma[..., 1], s2], axis=-1)

    return u, sigma, v


@jax.jit
def polar_rotation(f: jnp.ndarray) -> jnp.ndarray:
    """R from polar decomposition F = R S, matching compute_R_from_F
    (mpm_utils.py:556-580)."""
    u, _, v = svd3(f)
    return mat3.matmul_nt(u, v)
