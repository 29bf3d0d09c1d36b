"""Fused Pallas TPU kernel for per-tile Gaussian alpha blending.

The TPU analog of the reference's renderCUDA / renderBackwardCUDA
(diff-gaussian-rasterization cuda_rasterizer/forward.cu:262-399,
backward.cu:103-296): one program per image tile composites its
capacity-capped, depth-ordered splat list front-to-back.

Why a kernel: the XLA scan formulation materializes ~15 (T, 16, 16, C)
passes per chunk through HBM (116 ms fwd / 179 ms bwd at 800^2, 100k
splats); here everything lives in VMEM — the only HBM traffic is the
(T, 16, C) splat rows in and (T, 8, 256) tile images out (~30 MB).
The within-chunk exclusive transmittance is an MXU matmul against a
strict-triangular 0/1 matrix (built from iotas in-kernel: cumsum/cumprod
lower poorly in Mosaic, and pallas_call forbids captured constants).

The backward recomputes the forward per chunk (storing only the (P,)
transmittance carries), then walks chunks in reverse accumulating
suffix sums with the transposed triangular matmul — the standard 3DGS
backward, vectorized over all 256 pixels at once.

Row layout of the splat input g16 (T, 16, C):
  0 mx, 1 my, 2 c0, 3 c1, 4 c2 (conic), 5-7 rgb, 8 opacity, 9-15 pad.
Output out8 (T, 8, P=256): rows 0-2 color, 3 transmittance, 4-7 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

P = 256          # pixels per 16x16 tile
TILE = 16
ROWS_IN = 16
ROWS_OUT = 8
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _pixel_coords(t, tx_n):
    """(P, 1) pixel-center coordinates of tile t."""
    base_x = (t % tx_n) * TILE
    base_y = (t // tx_n) * TILE
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (base_x + i % TILE).astype(jnp.float32) + 0.5
    py = (base_y + i // TILE).astype(jnp.float32) + 0.5
    return px, py


def _tri(chunk, strict_upper: bool):
    """(chunk, chunk) strict triangular 0/1 matrix from iotas."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r < c if strict_upper else r > c).astype(jnp.float32)


def _chunk_geometry(d, sl, px, py):
    """alpha (P, chunk) of splat chunk sl against this tile's pixels."""
    mx, my = d[0, sl][None, :], d[1, sl][None, :]
    c0, c1, c2 = d[2, sl][None, :], d[3, sl][None, :], d[4, sl][None, :]
    op = d[8, sl][None, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
    e = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(op * e, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, e, dx, dy, (power < 0.0)


def _fwd_kernel(g_ref, out_ref, *, tx_n, chunk):
    d = g_ref[0]                      # (16, C)
    cap = d.shape[1]
    nc = cap // chunk
    t = pl.program_id(0)
    px, py = _pixel_coords(t, tx_n)
    tri_u = _tri(chunk, strict_upper=True)

    acc = [jnp.zeros((P,), jnp.float32) for _ in range(3)]
    trans = jnp.ones((P,), jnp.float32)
    carries = []   # trans at the start of chunks 1..ROWS_OUT-4 (bwd resumes
    # from these instead of replaying the forward)
    for k in range(nc):
        if k > 0:
            carries.append(trans)
        sl = slice(k * chunk, (k + 1) * chunk)
        alpha, _, _, _, _ = _chunk_geometry(d, sl, px, py)
        logm = jnp.log1p(-alpha)
        lx = jax.lax.dot_general(
            logm, tri_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # exclusive prefix along the chunk
        u = alpha * jnp.exp(lx)        # w / trans_in
        w = trans[:, None] * u
        for e_c in range(3):
            acc[e_c] = acc[e_c] + jnp.sum(w * d[5 + e_c, sl][None, :], axis=1)
        trans = trans * jnp.exp(jnp.sum(logm, axis=1))

    out_ref[0] = jnp.concatenate(
        [a[None, :] for a in acc] + [trans[None, :]]
        + [c[None, :] for c in carries]
        + [jnp.zeros((ROWS_OUT - 4 - len(carries), P), jnp.float32)],
        axis=0,
    )


def _bwd_kernel(g_ref, ct_ref, res_ref, dg_ref, *, tx_n, chunk):
    d = g_ref[0]
    ct = ct_ref[0]                    # (8, P)
    res = res_ref[0]                  # (8, P) forward output incl. carries
    cap = d.shape[1]
    nc = cap // chunk
    t = pl.program_id(0)
    px, py = _pixel_coords(t, tx_n)
    tri_u = _tri(chunk, strict_upper=True)

    # per-chunk transmittance carries saved by the forward (rows 4..)
    carries = [jnp.ones((P,), jnp.float32)] + [res[4 + k] for k in range(nc - 1)]

    dr, dgc, db = ct[0][:, None], ct[1][:, None], ct[2][:, None]
    dtrans = ct[3]                    # d/d trans_out of the LAST chunk
    grads = [None] * nc
    for k in reversed(range(nc)):
        sl = slice(k * chunk, (k + 1) * chunk)
        alpha, e, dx, dy, pgate = _chunk_geometry(d, sl, px, py)
        logm = jnp.log1p(-alpha)
        lx = jax.lax.dot_general(
            logm, tri_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        exl = jnp.exp(lx)
        u = alpha * exl
        trans_in = carries[k]
        w = trans_in[:, None] * u

        colr = d[5, sl][None, :]
        colg = d[6, sl][None, :]
        colb = d[7, sl][None, :]

        dw = dr * colr + dgc * colg + db * colb           # (P, chunk)

        # suffix over j > i of dw_j u_j (transposed strict-upper = lower)
        dwu = dw * u
        suff = jax.lax.dot_general(
            dwu, tri_u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        chunk_sum = jnp.sum(dwu, axis=1)
        exp_sum = trans_in * jnp.exp(jnp.sum(logm, axis=1))  # trans_out
        d_log = trans_in[:, None] * suff + (dtrans * exp_sum)[:, None]
        d_alpha = dw * trans_in[:, None] * exl - d_log / (1.0 - alpha)
        d_trans_in = chunk_sum + dtrans * jnp.exp(jnp.sum(logm, axis=1))
        dtrans = d_trans_in

        # through alpha = where(a0 < 1/255, 0, min(op*e, 0.99))
        live = (alpha > 0.0) & (alpha < ALPHA_MAX)
        d_ae = jnp.where(live, d_alpha, 0.0)
        op = d[8, sl][None, :]
        d_pow = jnp.where(pgate, d_ae * op * e, 0.0)
        c0 = d[2, sl][None, :]
        c1 = d[3, sl][None, :]
        c2 = d[4, sl][None, :]
        # all 9 per-splat pixel reductions as ONE (1,P)x(P,9*chunk) MXU dot
        # (separate M=1 dots are latency-bound: 13 of them cost ~25 us/tile)
        stacked = jnp.concatenate([
            d_pow * (c0 * dx + c1 * dy),       # d_mx
            d_pow * (c2 * dy + c1 * dx),       # d_my
            d_pow * (-0.5 * dx * dx),          # d_c0
            d_pow * (-dx * dy),                # d_c1
            d_pow * (-0.5 * dy * dy),          # d_c2
            dr * w, dgc * w, db * w,           # d_col rgb
            d_ae * e,                          # d_op
        ], axis=1)                             # (P, 9*chunk)
        red = jax.lax.dot_general(
            jnp.ones((1, P), jnp.float32), stacked,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]                                   # (9*chunk,)
        grads[k] = jnp.concatenate(
            [red.reshape(9, chunk),
             jnp.zeros((ROWS_IN - 9, chunk), jnp.float32)], axis=0,
        )                                      # (16, chunk)

    dg_ref[0] = jnp.concatenate(grads, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blend_tiles(g16, tx_n: int, chunk: int = 128, interpret: bool = False):
    """g16 (T, 16, C) depth-ordered splat rows -> (T, 8, P) tile images."""
    return _blend_fwd(g16, tx_n, chunk, interpret)[0]


def _blend_fwd(g16, tx_n, chunk, interpret):
    t_total = g16.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tx_n=tx_n, chunk=chunk),
        grid=(t_total,),
        in_specs=[pl.BlockSpec((1, ROWS_IN, g16.shape[2]), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, ROWS_OUT, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_total, ROWS_OUT, P), jnp.float32),
        interpret=interpret,
    )(g16)
    return out, (g16, out)


def _blend_bwd(tx_n, chunk, interpret, res, ct):
    g16, fwd_out = res
    t_total = g16.shape[0]
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, tx_n=tx_n, chunk=chunk),
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((1, ROWS_IN, g16.shape[2]), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ROWS_OUT, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ROWS_OUT, P), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ROWS_IN, g16.shape[2]), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(g16.shape, jnp.float32),
        interpret=interpret,
    )(g16, ct, fwd_out)
    return (dg,)


blend_tiles.defvjp(_blend_fwd, _blend_bwd)
