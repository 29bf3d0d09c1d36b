"""SoA (structure-of-arrays) particle math for the fast MPM path.

Why: the AoS layout stores per-particle matrices as (N,3,3) arrays, which on
TPU put the size-3 dims on the (8,128) register tile — every elementwise op
in the stress/transfer glue runs at ~3/128 lane occupancy (profiled: the
constitutive update alone cost ~2.2 ms/substep at N=100k, ~40x off
bandwidth).  Here a 3x3 matrix is a python list of nine (N,) component rows
(row-major) and a vector a list of three rows: every op is a full-lane (N,)
elementwise op, and XLA fuses whole chains without layout copies.

The algorithms are 1:1 ports of sim/mat3.py, sim/svd3.py and
sim/constitutive.py (which in turn mirror the reference Warp kernels,
mpm_utils.py:10-279); tests/test_soa.py asserts exact agreement.

Packing convention: packed matrices are (9, N) jnp arrays (row-major),
packed vectors (3, N) — N on the minor (lane) axis.
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------------------
# pack/unpack and AoS conversion
# --------------------------------------------------------------------------

def pack(rows):
    return jnp.stack(rows, axis=0)


def unpack(m):
    return [m[i] for i in range(m.shape[0])]


def aos_mat_to_rows(a):
    """(N,3,3) -> list of 9 (N,) rows."""
    return [a[:, i, j] for i in range(3) for j in range(3)]


def rows_to_aos_mat(rows):
    """9 rows -> (N,3,3)."""
    return jnp.stack(
        [jnp.stack(rows[3 * i : 3 * i + 3], axis=-1) for i in range(3)], axis=-2
    )


def aos_vec_to_rows(a):
    return [a[:, i] for i in range(a.shape[1])]


def rows_to_aos_vec(rows):
    return jnp.stack(rows, axis=-1)


# --------------------------------------------------------------------------
# mat3 algebra on row lists (ports of sim/mat3.py)
# --------------------------------------------------------------------------

def mm(a, b):
    """a @ b."""
    return [
        sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def mm_tn(a, b):
    """a^T @ b."""
    return [
        sum(a[3 * k + i] * b[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def mm_nt(a, b):
    """a @ b^T."""
    return [
        sum(a[3 * i + k] * b[3 * j + k] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def transpose(a):
    return [a[3 * j + i] for i in range(3) for j in range(3)]


def diag_mm_nt(u, s, v):
    """U diag(s) V^T; s is a 3-list."""
    return [
        sum(s[k] * u[3 * i + k] * v[3 * j + k] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def det3(m):
    return (
        m[0] * (m[4] * m[8] - m[5] * m[7])
        - m[1] * (m[3] * m[8] - m[5] * m[6])
        + m[2] * (m[3] * m[7] - m[4] * m[6])
    )


def identity_rows(like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [one, zero, zero, zero, one, zero, zero, zero, one]


def where_rows(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def scale_rows(s, a):
    return [s * x for x in a]


def add_rows(a, b):
    return [x + y for x, y in zip(a, b)]


def sym_rows(m):
    t = transpose(m)
    return [0.5 * (x + y) for x, y in zip(m, t)]


def col(m, j):
    """Column j as a 3-list."""
    return [m[j], m[3 + j], m[6 + j]]


def from_cols(c0, c1, c2):
    cols = (c0, c1, c2)
    return [cols[j][i] for i in range(3) for j in range(3)]


def norm3(v):
    return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def normalize3(v, eps=1e-12):
    n = jnp.maximum(norm3(v), eps)
    return [x / n for x in v]


def cross3(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


# --------------------------------------------------------------------------
# Branch-free 3x3 SVD (port of sim/svd3.py — Warp wp.svd3 conventions)
# --------------------------------------------------------------------------

_EPS = 1e-12


def _jacobi_rotation(app, aqq, apq):
    safe_apq = jnp.where(jnp.abs(apq) < _EPS, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    trivial = jnp.abs(apq) < _EPS
    c = jnp.where(trivial, 1.0, c)
    s = jnp.where(trivial, 0.0, s)
    return c, s


def _rotate_pq(s, v, c, sn, p, q):
    """(G^T S G, V G) for the Givens rotation in the (p,q) plane — row lists,
    no intermediate packing (everything stays fused)."""
    s1 = list(s)
    for i in range(3):
        sp, sq = s[3 * i + p], s[3 * i + q]
        s1[3 * i + p] = c * sp - sn * sq
        s1[3 * i + q] = sn * sp + c * sq
    s2 = list(s1)
    for j in range(3):
        rp, rq = s1[3 * p + j], s1[3 * q + j]
        s2[3 * p + j] = c * rp - sn * rq
        s2[3 * q + j] = sn * rp + c * rq
    v1 = list(v)
    for i in range(3):
        vp, vq = v[3 * i + p], v[3 * i + q]
        v1[3 * i + p] = c * vp - sn * vq
        v1[3 * i + q] = sn * vp + c * vq
    return s2, v1


def svd3_rows(f, sweeps: int = 5):
    """SVD of a row-list matrix; returns (u_rows, sigma_3list, v_rows)."""
    s = mm_tn(f, f)
    v = identity_rows(f[0])
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            c, sn = _jacobi_rotation(s[3 * p + p], s[3 * q + q], s[3 * p + q])
            s, v = _rotate_pq(s, v, c, sn, p, q)
    w = [s[0], s[4], s[8]]
    v0, v1, v2 = col(v, 0), col(v, 1), col(v, 2)

    def cswap(wa, va, wb, vb):
        swap = wa < wb
        return (
            jnp.where(swap, wb, wa),
            [jnp.where(swap, y, x) for x, y in zip(va, vb)],
            jnp.where(swap, wa, wb),
            [jnp.where(swap, x, y) for x, y in zip(va, vb)],
        )

    w0, w1, w2 = w
    w0, v0, w1, v1 = cswap(w0, v0, w1, v1)
    w0, v0, w2, v2 = cswap(w0, v0, w2, v2)
    w1, v1, w2, v2 = cswap(w1, v1, w2, v2)

    # Re-orthonormalize V (Gram-Schmidt + cross completion).  For (near-)
    # degenerate eigenvalues the fused Jacobi can drift V off orthogonality —
    # observed on XLA:CPU as exactly duplicated columns inside larger fusion
    # contexts — and a non-rotation V makes the sand projection u v^T
    # singular (log(0) -> NaN downstream).  This also subsumes the
    # det(V)=+1 sign fix: v2 = v0 x v1 has determinant +1 by construction.
    one = jnp.ones_like(v0[0])
    zero = jnp.zeros_like(v0[0])
    v0 = normalize3(v0)
    proj01 = dot3(v1, v0)
    v1 = [b - proj01 * a for a, b in zip(v0, v1)]
    v1_bad = norm3(v1) < 1e-6
    alt_v = cross3(v0, [one, zero, zero])
    alt_v_small = norm3(alt_v) < 1e-6
    alt_v = [jnp.where(alt_v_small, y, x)
             for x, y in zip(alt_v, cross3(v0, [zero, one, zero]))]
    alt_vn = normalize3(alt_v)
    v1n = normalize3(v1)
    v1 = [jnp.where(v1_bad, a, b) for a, b in zip(alt_vn, v1n)]
    v2 = cross3(v0, v1)
    v_rows = from_cols(v0, v1, v2)

    sig = [jnp.sqrt(jnp.maximum(x, 0.0)) for x in (w0, w1, w2)]

    fv = mm(f, v_rows)
    u0 = normalize3(col(fv, 0))
    u1_raw = col(fv, 1)
    proj = dot3(u1_raw, u0)
    u1_raw = [x - proj * y for x, y in zip(u1_raw, u0)]
    one = jnp.ones_like(u0[0])
    zero = jnp.zeros_like(u0[0])
    ex = [one, zero, zero]
    ey = [zero, one, zero]
    ez = [zero, zero, one]
    alt = cross3(u0, ex)
    alt_small = norm3(alt) < 1e-6
    alt = [jnp.where(alt_small, y, x) for x, y in zip(alt, cross3(u0, ey))]
    u1_small = norm3(u1_raw) < 1e-6 * jnp.maximum(sig[0], 1e-6)
    alt_n = normalize3(alt)
    u1_n = normalize3(u1_raw)
    u1 = [jnp.where(u1_small, a, b) for a, b in zip(alt_n, u1_n)]
    u2 = cross3(u0, u1)
    tiny = sig[0] < 1e-10
    u0 = [jnp.where(tiny, e, x) for e, x in zip(ex, u0)]
    u1 = [jnp.where(tiny, e, x) for e, x in zip(ey, u1)]
    u2 = [jnp.where(tiny, e, x) for e, x in zip(ez, u2)]
    u_rows = from_cols(u0, u1, u2)

    det_f = det3(f)
    sig[2] = sig[2] * jnp.where(det_f < 0.0, -1.0, 1.0)
    return u_rows, sig, v_rows
