"""Pallas MPM transfer kernels: tiled P2G splat and G2P gather.

Replaces the reference's atomic-scatter P2G (mpm_utils.py:338-394) and
per-particle gather G2P (mpm_utils.py:412-463) with TPU-native kernels:

  * particles live in a tile-sorted, block-padded layout (ops/tiling.py);
  * each program processes one PBLK-particle block of one tile;
  * the quadratic B-spline splat is expressed as one-hot weighted window
    factors (PBLK, WIN_S) per axis — three variants each: w, w*(i-fx), dw —
    combined into per-particle (y,z) pair maps and contracted against
    channel-stacked left matrices on the MXU, accumulating the tile's
    (4ch, WIN_S, WIN_S^2) node window entirely in VMEM;
  * G2P runs the transpose: pair maps against the tile's grid-velocity
    window, then per-axis-variant contractions recover velocity, the APIC
    C matrix and the velocity gradient per particle.

No scatter/gather instructions anywhere; the only dynamic indexing is the
block->tile output/input mapping, expressed through BlockSpec index_maps on
a scalar-prefetched tile-id table.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixie_tpu.ops.tiling import (
    NSLAB, ORIGIN, PAIRW, PBLK, U0_HI, WIN_S, ZWIN_S,
)

_ZSHIFT = ZWIN_S.bit_length() - 1  # log2 of the stored z-window width

# pdata channel layout (see build_pdata)
_CH = 32
_U0, _FX, _M = 0, 3, 6
_QA, _QBX, _QBY, _QBZ = 7, 10, 13, 16
_QSX, _QSY, _QSZ = 19, 22, 25

N_GRID_CH = 4   # momentum x/y/z + mass
N_VEL_CH = 3
OUT_CH = 32     # g2p: v(3) C(9) grad(9) padded to 32

# bf16 inputs / fp32 accumulation for the transfer contractions: ~4x MXU rate
# at ~0.4% relative transfer error.  Module-level switch (import-time) so the
# reference-parity tests keep fp32; enable via
# pixie_tpu.ops.transfer.BF16_DOTS = True before building the solver.
BF16_DOTS = False

# build the (y,z) pair maps via narrow factors + constant MXU broadcast
# (_pairs_mxu) instead of wide VPU one-hot chains (_pairs).  Measured SLOWER
# on v5e (82 vs 109 substeps/s @100k): the broadcast dots serialize against
# the kernels' main contraction instead of overlapping with the VPU work.
# Kept for A/B forensics; default off.
PAIRS_MXU = os.environ.get("PIXIE_PAIRS_MXU", "0") == "1"

# emit the kernels' contraction as five per-variant accumulating dots, each
# issued right after its (VPU-built) pair map, instead of one big concat dot
# after all pair maps exist — gives Mosaic a chance to overlap the VPU pair
# construction of variant v+1 with the MXU dot of variant v.
SPLIT_DOTS = os.environ.get("PIXIE_SPLIT_DOTS", "0") == "1"


def _pairs_dispatch(u0y, fy, u0z, fz):
    fn = _pairs_mxu if PAIRS_MXU else _pairs
    return fn(u0y, fy, u0z, fz)


def build_pdata(x, v, C, stress, mass, vol, tile_coords_per_slot, dt, dx, inv_dx):
    """Assemble the kernel input (Np, 32) from padded-layout state arrays.

    All dense elementwise math (XLA).  tile_coords_per_slot is (Np, 3) int32.
    """
    grid_pos = x * inv_dx
    base = jnp.floor(grid_pos - 0.5).astype(jnp.int32)
    fx = grid_pos - base.astype(jnp.float32)
    # window-relative base; per-axis origin scale (z sub-tiled into slabs)
    u0 = base - tile_coords_per_slot * jnp.asarray(ORIGIN, jnp.int32) + 1
    u0 = jnp.clip(u0, 0, jnp.asarray(U0_HI, jnp.int32)).astype(jnp.float32)

    qa = mass[:, None] * v
    qb = mass[:, None, None] * dx * C          # (Np,3,3)
    qs = -(vol * dt)[:, None, None] * stress * inv_dx

    cols = [
        u0, fx, mass[:, None], qa,
        qb[:, :, 0], qb[:, :, 1], qb[:, :, 2],
        qs[:, :, 0], qs[:, :, 1], qs[:, :, 2],
    ]
    pdata = jnp.concatenate(cols, axis=1)
    pad = _CH - pdata.shape[1]
    return jnp.pad(pdata, ((0, 0), (0, pad)))


def _window_factors(u0, fx):
    """One-hot weighted window factor matrices for one axis.

    u0, fx: (PBLK,) -> X1, X2, X3: (PBLK, WIN_S) with
      X1 = sum_i w_i * onehot(u0+i), X2 = sum_i w_i*(i-fx)*onehot, X3 = sum_i dw_i*onehot
    (B-spline weights as in p2g_apic_with_stress, mpm_utils.py:342-358).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (u0.shape[0], WIN_S), 1)
    u0i = u0.astype(jnp.int32)
    w = [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2]
    dw = [fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5]
    zero = jnp.zeros((u0.shape[0], WIN_S), jnp.float32)
    x1 = zero
    x2 = zero
    x3 = zero
    for i in range(3):
        hit = (iota == (u0i + i)[:, None]).astype(jnp.float32)
        x1 = x1 + w[i][:, None] * hit
        x2 = x2 + (w[i] * (i - fx))[:, None] * hit
        x3 = x3 + dw[i][:, None] * hit
    return x1, x2, x3


def _pairs(u0y, fy, u0z, fz):
    """The five (PBLK, PAIRW) (y,z) pair maps for variant combinations
    (1,1), (2,1), (1,2), (3,1), (1,3), built as products of WIDE per-axis
    factors (each column has at most one active stencil entry per axis, so
    e.g. the dpos-weighted variant is the base variant times a per-column
    affine term).  19 elementwise passes vs 45 for the naive 9-term loop.

    Constructed 256-wide with shifts/masks on a 2D iota — Mosaic does not
    support the (P, 16, 16) -> (P, 256) vector reshape an outer-product
    formulation would need.
    """
    n = u0y.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, PAIRW), 1)
    cy = (col >> _ZSHIFT).astype(jnp.float32)   # pair col = uy*ZWIN_S + uz
    cz = (col & (ZWIN_S - 1)).astype(jnp.float32)
    u0yc = u0y[:, None]
    u0zc = u0z[:, None]
    fyc = fy[:, None]
    fzc = fz[:, None]

    def wide_factors(c, u0c, fc):
        """(w-wide, w*dpos-wide, dw-wide) factors over the 256 columns."""
        w = [0.5 * (1.5 - fc) ** 2, 0.75 - (fc - 1.0) ** 2, 0.5 * (fc - 0.5) ** 2]
        dw = [fc - 1.5, -2.0 * (fc - 1.0), fc - 0.5]
        w1 = jnp.zeros_like(c)
        w3 = jnp.zeros_like(c)
        for i in range(3):
            hit = c == (u0c + i)
            w1 = jnp.where(hit, w[i], w1)
            w3 = jnp.where(hit, dw[i], w3)
        # dpos modifier: i - f == (c - u0) - f on active columns
        w2 = w1 * (c - u0c - fc)
        return w1, w2, w3

    y1, y2, y3 = wide_factors(cy, u0yc, fyc)
    z1, z2, z3 = wide_factors(cz, u0zc, fzc)
    return y1 * z1, y2 * z1, y1 * z2, y3 * z1, y1 * z3


def _pairs_mxu(u0y, fy, u0z, fz):
    """_pairs via narrow factors + MXU broadcast: the wide construction above
    is ~19 full-(PBLK,256) VPU passes; here the six per-axis factors are
    built (PBLK, WIN_S) narrow (1/16 the vector traffic) and broadcast to
    the 256 pair columns by two constant 0/1 matmuls (the MXU sits idle
    between the kernels' main dots), leaving 5 wide multiplies."""
    assert NSLAB == 1, "_pairs_mxu supports square windows only (no slab)"
    n = u0y.shape[0]
    y1, y2, y3 = _window_factors(u0y, fy)
    z1, z2, z3 = _window_factors(u0z, fz)
    # col c = uy*WIN_S + uz;  Ey[k,c] = [uy==k], Ez[k,c] = [uz==k]; built
    # from iotas in-kernel (pallas_call forbids captured array constants)
    row = jax.lax.broadcasted_iota(jnp.int32, (WIN_S, PAIRW), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (WIN_S, PAIRW), 1)
    ey = (col >> 4 == row).astype(jnp.float32)
    ez = ((col & (WIN_S - 1)) == row).astype(jnp.float32)

    def bcast(f, e):
        return jax.lax.dot_general(
            f, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    yw = bcast(jnp.concatenate([y1, y2, y3], axis=0), ey)
    zw = bcast(jnp.concatenate([z1, z2, z3], axis=0), ez)
    y1w, y2w, y3w = yw[:n], yw[n:2 * n], yw[2 * n:]
    z1w, z2w, z3w = zw[:n], zw[n:2 * n], zw[2 * n:]
    return y1w * z1w, y2w * z1w, y1w * z2w, y3w * z1w, y1w * z3w


def _p2g_kernel(tile_ref, pdata_ref, out_ref):
    i = pl.program_id(0)

    first = jnp.logical_or(i == 0, tile_ref[i] != tile_ref[jnp.maximum(i - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    d = pdata_ref[...]  # (PBLK, 32)
    x1, x2, x3 = _window_factors(d[:, _U0 + 0], d[:, _FX + 0])
    p11, p21, p12, p31, p13 = _pairs_dispatch(
        d[:, _U0 + 1], d[:, _FX + 1], d[:, _U0 + 2], d[:, _FX + 2]
    )

    m = d[:, _M]
    qa = d[:, _QA:_QA + 3]
    qbx = d[:, _QBX:_QBX + 3]
    qby = d[:, _QBY:_QBY + 3]
    qbz = d[:, _QBZ:_QBZ + 3]
    qsx = d[:, _QSX:_QSX + 3]
    qsy = d[:, _QSY:_QSY + 3]
    qsz = d[:, _QSZ:_QSZ + 3]

    def lefts(per_ch_x):
        """per_ch_x: list of 4 (PBLK, WIN_S) -> (PBLK, 4*WIN_S)."""
        return jnp.concatenate(per_ch_x, axis=1)

    l11 = lefts(
        [x1 * qa[:, c:c + 1] + x2 * qbx[:, c:c + 1] + x3 * qsx[:, c:c + 1]
         for c in range(3)] + [x1 * m[:, None]]
    )
    zero = jnp.zeros_like(x1)
    l21 = lefts([x1 * qby[:, c:c + 1] for c in range(3)] + [zero])
    l12 = lefts([x1 * qbz[:, c:c + 1] for c in range(3)] + [zero])
    l31 = lefts([x1 * qsy[:, c:c + 1] for c in range(3)] + [zero])
    l13 = lefts([x1 * qsz[:, c:c + 1] for c in range(3)] + [zero])

    # one MXU-friendly dot: sum_v L_v^T P_v == vstack(L)^T @ vstack(P)
    left_big = jnp.concatenate([l11, l21, l12, l31, l13], axis=0)   # (5*PBLK, 64)
    pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)   # (5*PBLK, 256)
    if BF16_DOTS:
        left_big = left_big.astype(jnp.bfloat16)
        pair_big = pair_big.astype(jnp.bfloat16)
    out_ref[...] = out_ref[...] + jax.lax.dot_general(
        left_big, pair_big, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None]


def p2g_tiled(pdata, block_tile, n_tiles_total: int, interpret: bool = False):
    """pdata (NB*PBLK, 32), block_tile (NB,) -> windows
    (n_tiles_total, 4*WIN_S, PAIRW) fp32."""
    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((PBLK, _CH), lambda i, tile_ref: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, N_GRID_CH * WIN_S, PAIRW),
            lambda i, tile_ref: (tile_ref[i], 0, 0),
        ),
    )
    return pl.pallas_call(
        _p2g_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles_total, N_GRID_CH * WIN_S, PAIRW), jnp.float32
        ),
        interpret=interpret,
    )(block_tile, pdata)


def build_pdata_rows(x, v, C, stress, mass, vol, tile_rows, dt, dx, inv_dx):
    """SoA variant of build_pdata: row-list inputs -> (32, Np) kernel input.

    x, v: 3-lists of (Np,) rows; C, stress: 9-lists (row-major); tile_rows:
    3-list of int32 tile coordinates per slot.  Every op is full-lane (N,)
    elementwise; the only layout change is the final (32, Np) stack.
    """
    u0, fx = [], []
    for a in range(3):
        gp = x[a] * inv_dx
        base = jnp.floor(gp - 0.5)
        fx.append(gp - base)
        u0.append(jnp.clip(
            base.astype(jnp.int32) - tile_rows[a] * ORIGIN[a] + 1,
            0, U0_HI[a],
        ).astype(jnp.float32))

    qa = [mass * v[a] for a in range(3)]
    sb = mass * dx
    ss = -(vol * dt) * inv_dx
    # channel groups mirror build_pdata: qb/qs columns (j fixed, i varies)
    qb_cols = [[sb * C[3 * i + j] for i in range(3)] for j in range(3)]
    qs_cols = [[ss * stress[3 * i + j] for i in range(3)] for j in range(3)]

    rows = (u0 + fx + [mass] + qa
            + qb_cols[0] + qb_cols[1] + qb_cols[2]
            + qs_cols[0] + qs_cols[1] + qs_cols[2])
    zero = jnp.zeros_like(mass)
    rows = rows + [zero] * (_CH - len(rows))
    return jnp.stack(rows, axis=0)


def _p2g_kernel_t(tile_ref, pdata_ref, out_ref, acc_ref):
    """Transposed-layout P2G: pdata block is (32, PBLK) — full-lane rows.

    Accumulates same-tile blocks in a VMEM scratch and writes the output
    block once, on the tile's last program: the revisit-accumulate pattern
    (read-modify-write of out_ref by consecutive programs) serializes the
    Mosaic pipeline on the out-block round-trip.
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    first = jnp.logical_or(i == 0, tile_ref[i] != tile_ref[jnp.maximum(i - 1, 0)])
    last = jnp.logical_or(
        i == nb - 1, tile_ref[jnp.minimum(i + 1, nb - 1)] != tile_ref[i]
    )

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = pdata_ref[...]  # (32, PBLK)
    x1, x2, x3 = _window_factors(d[_U0 + 0], d[_FX + 0])
    p11, p21, p12, p31, p13 = _pairs_dispatch(
        d[_U0 + 1], d[_FX + 1], d[_U0 + 2], d[_FX + 2]
    )

    def lefts(per_ch_x):
        return jnp.concatenate(per_ch_x, axis=1)

    m = d[_M]
    l11 = lefts(
        [x1 * d[_QA + c][:, None] + x2 * d[_QBX + c][:, None]
         + x3 * d[_QSX + c][:, None] for c in range(3)] + [x1 * m[:, None]]
    )
    zero = jnp.zeros_like(x1)
    l21 = lefts([x1 * d[_QBY + c][:, None] for c in range(3)] + [zero])
    l12 = lefts([x1 * d[_QBZ + c][:, None] for c in range(3)] + [zero])
    l31 = lefts([x1 * d[_QSY + c][:, None] for c in range(3)] + [zero])
    l13 = lefts([x1 * d[_QSZ + c][:, None] for c in range(3)] + [zero])

    if SPLIT_DOTS:
        acc = jnp.zeros_like(acc_ref)
        for l, p in zip((l11, l21, l12, l31, l13), (p11, p21, p12, p31, p13)):
            acc = acc + jax.lax.dot_general(
                l, p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] = acc_ref[...] + acc
    else:
        left_big = jnp.concatenate([l11, l21, l12, l31, l13], axis=0)
        pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
        if BF16_DOTS:
            left_big = left_big.astype(jnp.bfloat16)
            pair_big = pair_big.astype(jnp.bfloat16)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            left_big, pair_big, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...][None]


def p2g_tiled_t(pdata_t, block_tile, n_tiles_total: int, interpret: bool = False):
    """pdata_t (32, NB*PBLK), block_tile (NB,) -> windows
    (n_tiles_total, 4*WIN_S, PAIRW) fp32."""
    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_CH, PBLK), lambda i, tile_ref: (0, i)),
        ],
        out_specs=pl.BlockSpec(
            (1, N_GRID_CH * WIN_S, PAIRW),
            lambda i, tile_ref: (tile_ref[i], 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_GRID_CH * WIN_S, PAIRW), jnp.float32)
        ],
    )
    return pl.pallas_call(
        _p2g_kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles_total, N_GRID_CH * WIN_S, PAIRW), jnp.float32
        ),
        interpret=interpret,
    )(block_tile, pdata_t)


OUT_CH_T = 24   # g2p rows: per channel c [v, Cx, Cy, Cz, gx, gy, gz] = 21 + pad


def _g2p_kernel_t(tile_ref, pdata_ref, win_ref, out_ref):
    d = pdata_ref[...]  # (32, PBLK)
    x1, x2, x3 = _window_factors(d[_U0 + 0], d[_FX + 0])
    p11, p21, p12, p31, p13 = _pairs_dispatch(
        d[_U0 + 1], d[_FX + 1], d[_U0 + 2], d[_FX + 2]
    )

    win = win_ref[0]
    n = x1.shape[0]
    if SPLIT_DOTS:
        ts = [jax.lax.dot_general(
            p, win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) for p in (p11, p21, p12, p31, p13)]

        def t(v, c):
            return ts[v][:, c * WIN_S : (c + 1) * WIN_S]
    else:
        pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
        if BF16_DOTS:
            pair_big = pair_big.astype(jnp.bfloat16)
            win = win.astype(jnp.bfloat16)
        t_big = jax.lax.dot_general(
            pair_big, win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def t(v, c):
            return t_big[v * n : (v + 1) * n, c * WIN_S : (c + 1) * WIN_S]

    rows = []
    for c in range(3):
        t11, t21, t12, t31, t13 = (t(0, c), t(1, c), t(2, c), t(3, c), t(4, c))
        rows.extend([
            jnp.sum(x1 * t11, axis=1),
            jnp.sum(x2 * t11, axis=1),
            jnp.sum(x1 * t21, axis=1),
            jnp.sum(x1 * t12, axis=1),
            jnp.sum(x3 * t11, axis=1),
            jnp.sum(x1 * t31, axis=1),
            jnp.sum(x1 * t13, axis=1),
        ])
    zero = jnp.zeros_like(rows[0])
    rows = rows + [zero] * (OUT_CH_T - len(rows))
    out_ref[...] = jnp.stack(rows, axis=0)


def g2p_tiled_t(pdata_t, windows, block_tile, interpret: bool = False):
    """pdata_t (32, NB*PBLK), windows (T3, 3*WIN_S, WIN_S^2), block_tile (NB,)
    -> (OUT_CH_T, NB*PBLK) rows: per channel c [v_c, C_cx, C_cy, C_cz, g_cx,
    g_cy, g_cz] (unitless; caller applies inv_dx scalings)."""
    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_CH, PBLK), lambda i, tile_ref: (0, i)),
            pl.BlockSpec(
                (1, N_VEL_CH * WIN_S, PAIRW),
                lambda i, tile_ref: (tile_ref[i], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((OUT_CH_T, PBLK), lambda i, tile_ref: (0, i)),
    )
    return pl.pallas_call(
        _g2p_kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_CH_T, nb * PBLK), jnp.float32),
        interpret=interpret,
    )(block_tile, pdata_t, windows)


def _g2p_kernel(tile_ref, pdata_ref, win_ref, out_ref):
    d = pdata_ref[...]
    x1, x2, x3 = _window_factors(d[:, _U0 + 0], d[:, _FX + 0])
    p11, p21, p12, p31, p13 = _pairs_dispatch(
        d[:, _U0 + 1], d[:, _FX + 1], d[:, _U0 + 2], d[:, _FX + 2]
    )

    win = win_ref[0]  # (3*WIN_S, WIN_S^2)

    # ONE MXU dot for all (variant, channel) contractions:
    # vstack(P_v) (5*PBLK, YZ) @ win^T (YZ, 3*WIN_S) -> (5*PBLK, 3*WIN_S)
    pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
    if BF16_DOTS:
        pair_big = pair_big.astype(jnp.bfloat16)
        win = win.astype(jnp.bfloat16)
    t_big = jax.lax.dot_general(
        pair_big, win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n = x1.shape[0]

    def t(v, c):
        return t_big[v * n : (v + 1) * n, c * WIN_S : (c + 1) * WIN_S]

    outs = []
    for c in range(3):
        t11, t21, t12, t31, t13 = (t(0, c), t(1, c), t(2, c), t(3, c), t(4, c))
        v_c = jnp.sum(x1 * t11, axis=1, keepdims=True)
        c_x = jnp.sum(x2 * t11, axis=1, keepdims=True)
        c_y = jnp.sum(x1 * t21, axis=1, keepdims=True)
        c_z = jnp.sum(x1 * t12, axis=1, keepdims=True)
        g_x = jnp.sum(x3 * t11, axis=1, keepdims=True)
        g_y = jnp.sum(x1 * t31, axis=1, keepdims=True)
        g_z = jnp.sum(x1 * t13, axis=1, keepdims=True)
        outs.extend([v_c, c_x, c_y, c_z, g_x, g_y, g_z])

    res = jnp.concatenate(outs, axis=1)  # (PBLK, 21)
    out_ref[...] = jnp.pad(res, ((0, 0), (0, OUT_CH - res.shape[1])))


def g2p_tiled(pdata, windows, block_tile, interpret: bool = False):
    """pdata (NB*PBLK,32), windows (T3, 3*WIN_S, WIN_S^2), block_tile (NB,)
    -> (NB*PBLK, 32): per channel c: [v_c, C_cx, C_cy, C_cz, g_cx, g_cy, g_cz]
    (unitless; caller applies inv_dx scalings)."""
    nb = block_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((PBLK, _CH), lambda i, tile_ref: (i, 0)),
            pl.BlockSpec(
                (1, N_VEL_CH * WIN_S, PAIRW),
                lambda i, tile_ref: (tile_ref[i], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((PBLK, OUT_CH), lambda i, tile_ref: (i, 0)),
    )
    return pl.pallas_call(
        _g2p_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * PBLK, OUT_CH), jnp.float32),
        interpret=interpret,
    )(block_tile, pdata, windows)
