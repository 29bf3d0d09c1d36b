"""Stream-blend Pallas kernel: per-tile alpha blending over a candidate-
sorted splat stream with scalar-prefetch block windows.

The TPU answer to the reference's tile pipeline economics
(diff-gaussian-rasterization cuda_rasterizer/forward.cu:262-399,
rasterizer_impl.cu:70-116): CUDA allocates exactly ``num_rendered``
duplicated (tile, depth)-sorted entries and each tile walks its contiguous
range.  The first TPU port instead gathered a dense (T, tile_cap) slot
table — 1.28M serialized row-gathers (~78 ms at 800^2/100k, docs/DESIGN.md).

Here the duplicated candidates live in ONE depth-sorted stream whose
per-tile ranges are padded to 128-column (chunk) alignment, so every
(tile, chunk) grid step maps to a *whole block* of the stream:
``index_map`` reads the tile's start block from a scalar-prefetch array
and Pallas pipelines the HBM->VMEM windows automatically — no gathers,
no manual DMA.  Stream construction (rasterizer.py) costs O(stream)
narrow gathers instead of O(T * tile_cap).

Blend math is identical to ops/gs_blend.py (triangular-matmul exclusive
transmittance on the MXU; backward recomputes per chunk from saved
carries).  Masking: column j of chunk k is live iff k*CH + j < count[t];
padding blocks are fetched (clamped index) but blend as alpha = 0.

Layout:
  g       (16, B)  stream splat rows: 0 mx, 1 my, 2-4 conic, 5-7 rgb,
                   8 opacity, 9-15 pad; B a multiple of CH=128.
  out     (T, 4, P)  rows 0-2 color, 3 final transmittance.
  carr    (T, 8, P)  transmittance at the start of chunks 1..nc-1
                     (backward restart points), rows nc-1.. undefined.
  dg      (16, B + CH)  input cotangent; the trailing CH columns are a
                     trash block for empty tiles (sliced off by callers).
Scalar prefetch (all int32 (T,)):
  ps   tile start, in blocks;   nch  tile chunk count;   cnt  splat count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256          # pixels per 16x16 tile
TILE = 16
CH = 128         # splats per chunk = stream block width
ROWS_IN = 16
ROWS_CARR = 8
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _pixel_coords(t, tx_n):
    base_x = (t % tx_n) * TILE
    base_y = (t // tx_n) * TILE
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (base_x + i % TILE).astype(jnp.float32) + 0.5
    py = (base_y + i // TILE).astype(jnp.float32) + 0.5
    return px, py


def _tri(strict_upper: bool):
    r = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    return (r < c if strict_upper else r > c).astype(jnp.float32)


def _chunk_geometry(d, px, py, n_live):
    """alpha (P, CH) of a stream block against this tile's pixels; columns
    >= n_live are masked to zero (alignment padding / clamped refetch)."""
    mx, my = d[0][None, :], d[1][None, :]
    c0, c1, c2 = d[2][None, :], d[3][None, :], d[4][None, :]
    op = d[8][None, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
    e = jnp.exp(jnp.minimum(power, 0.0))
    live = jax.lax.broadcasted_iota(jnp.int32, (P, CH), 1) < n_live
    alpha = jnp.minimum(op * e, ALPHA_MAX)
    alpha = jnp.where((alpha >= ALPHA_MIN) & live, alpha, 0.0)
    return alpha, e, dx, dy, (power < 0.0) & live


def _g_index(t, k, ps, nch, n_blocks, reverse, nc_max):
    """Stream block for grid step (t, k): chunk min(k, nch-1) of tile t
    (clamped so masked steps re-read the tile's last block — a free
    revisit), bounded to the real stream."""
    kc = (nc_max - 1 - k) if reverse else k
    kc = jnp.maximum(jnp.minimum(kc, nch[t] - 1), 0)
    return jnp.minimum(ps[t] + kc, n_blocks - 1)


def _fwd_kernel(ps_ref, nch_ref, cnt_ref, g_ref, out_ref, carr_ref,
                *, tx_n, nc_max):
    t = pl.program_id(0)
    k = pl.program_id(1)
    cnt = cnt_ref[t]

    @pl.when(k == 0)
    def _init():
        out_ref[0, 0:3, :] = jnp.zeros((3, P), jnp.float32)
        out_ref[0, 3, :] = jnp.ones((P,), jnp.float32)
        carr_ref[0] = jnp.ones((ROWS_CARR, P), jnp.float32)

    @pl.when(k < jnp.maximum(nch_ref[t], 1))
    def _blend():
        d = g_ref[...]                      # (16, CH)
        px, py = _pixel_coords(t, tx_n)
        trans_in = out_ref[0, 3, :]
        for i in range(1, nc_max):
            @pl.when(k == i)
            def _save(i=i):
                carr_ref[0, i - 1, :] = trans_in

        alpha, _, _, _, _ = _chunk_geometry(d, px, py, cnt - k * CH)
        logm = jnp.log1p(-alpha)
        lx = jax.lax.dot_general(
            logm, _tri(True), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = alpha * jnp.exp(lx)
        w = trans_in[:, None] * u
        for e_c in range(3):
            out_ref[0, e_c, :] += jnp.sum(w * d[5 + e_c][None, :], axis=1)
        out_ref[0, 3, :] = trans_in * jnp.exp(jnp.sum(logm, axis=1))


def _bwd_kernel(ps_ref, nch_ref, cnt_ref, g_ref, ct_ref, carr_ref,
                dg_ref, dt_scr, *, tx_n, nc_max):
    t = pl.program_id(0)
    k = pl.program_id(1)
    kc_raw = nc_max - 1 - k                 # reverse chunk order
    nch = nch_ref[t]
    cnt = cnt_ref[t]
    kc = jnp.maximum(jnp.minimum(kc_raw, nch - 1), 0)

    @pl.when(k == 0)
    def _init():
        dt_scr[0, :] = ct_ref[0, 3, :]      # d loss / d final transmittance

    d = g_ref[...]
    px, py = _pixel_coords(t, tx_n)
    # masked steps (kc_raw >= nch, or empty tile) still write zeros into
    # their (clamped / trash) dg block; the real step overwrites later.
    n_live = jnp.where(kc_raw == kc, cnt - kc * CH, 0)
    alpha, e, dx, dy, pgate = _chunk_geometry(d, px, py, n_live)
    logm = jnp.log1p(-alpha)
    lx = jax.lax.dot_general(
        logm, _tri(True), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    exl = jnp.exp(lx)
    u = alpha * exl

    # transmittance at chunk entry: ones for chunk 0, else the saved carry
    trans_in = jnp.where(kc == 0, jnp.ones((P,), jnp.float32),
                         carr_ref[0, jnp.maximum(kc - 1, 0), :])
    w = trans_in[:, None] * u

    dr = ct_ref[0, 0, :][:, None]
    dgc = ct_ref[0, 1, :][:, None]
    db = ct_ref[0, 2, :][:, None]
    dtrans = dt_scr[0, :]

    dw = dr * d[5][None, :] + dgc * d[6][None, :] + db * d[7][None, :]
    dwu = dw * u
    suff = jax.lax.dot_general(
        dwu, _tri(True), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sum_logm = jnp.sum(logm, axis=1)
    d_log = trans_in[:, None] * suff + (dtrans * trans_in
                                        * jnp.exp(sum_logm))[:, None]
    d_alpha = dw * trans_in[:, None] * exl - d_log / (1.0 - alpha)
    d_trans_in = jnp.sum(dwu, axis=1) + dtrans * jnp.exp(sum_logm)
    dt_scr[0, :] = jnp.where(n_live > 0, d_trans_in, dtrans)

    live = (alpha > 0.0) & (alpha < ALPHA_MAX)
    d_ae = jnp.where(live, d_alpha, 0.0)
    op = d[8][None, :]
    d_pow = jnp.where(pgate, d_ae * op * e, 0.0)
    c0, c1, c2 = d[2][None, :], d[3][None, :], d[4][None, :]
    stacked = jnp.concatenate([
        d_pow * (c0 * dx + c1 * dy),
        d_pow * (c2 * dy + c1 * dx),
        d_pow * (-0.5 * dx * dx),
        d_pow * (-dx * dy),
        d_pow * (-0.5 * dy * dy),
        dr * w, dgc * w, db * w,
        d_ae * e,
    ], axis=1)                              # (P, 9*CH)
    red = jax.lax.dot_general(
        jnp.ones((1, P), jnp.float32), stacked,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    dg_ref[...] = jnp.concatenate(
        [red.reshape(9, CH), jnp.zeros((ROWS_IN - 9, CH), jnp.float32)],
        axis=0)


def _dg_index(t, k, ps, nch, n_blocks, nc_max):
    """dg block for bwd step (t, k): the tile's chunk, or the trash block
    (index n_blocks, dg is one block wider than the stream) when the tile
    is empty so zero-writes never land on a neighbour's gradients."""
    kc_raw = nc_max - 1 - k
    kc = jnp.maximum(jnp.minimum(kc_raw, nch[t] - 1), 0)
    idx = jnp.minimum(ps[t] + kc, n_blocks - 1)
    return jnp.where(nch[t] > 0, idx, n_blocks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_stream(g16, ps, nch, cnt, tx_n: int, n_tiles: int, nc_max: int,
                 interpret: bool = False):
    """g16 (16, B) candidate stream -> (out (T, 4, P), carr (T, 8, P)).

    ps/nch/cnt int32 (T,): per-tile start block, chunk count, splat count.
    B must be a multiple of CH; tile chunk lists must be disjoint
    (ps[t] + nch[t] <= ps[t+1]) and bounded: nch <= nc_max <= ROWS_CARR + 1.
    """
    return _stream_fwd(g16, ps, nch, cnt, tx_n, n_tiles, nc_max,
                       interpret)[0]


def _stream_fwd(g16, ps, nch, cnt, tx_n, n_tiles, nc_max, interpret):
    n_blocks = g16.shape[1] // CH
    grid = (n_tiles, nc_max)
    kwargs = dict(tx_n=tx_n, nc_max=nc_max)
    out, carr = pl.pallas_call(
        functools.partial(_fwd_kernel, **kwargs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (ROWS_IN, CH),
                    lambda t, k, ps, nch, cnt: (
                        0, _g_index(t, k, ps, nch, n_blocks, False, nc_max)),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 4, P), lambda t, k, *_: (t, 0, 0)),
                pl.BlockSpec((1, ROWS_CARR, P), lambda t, k, *_: (t, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 4, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, ROWS_CARR, P), jnp.float32),
        ],
        interpret=interpret,
    )(ps, nch, cnt, g16)
    return (out, carr), (g16, ps, nch, cnt, carr)


def _stream_bwd(tx_n, n_tiles, nc_max, interpret, res, cts):
    g16, ps, nch, cnt, carr = res
    ct_out, _ct_carr = cts                  # carr is residual-only
    n_blocks = g16.shape[1] // CH
    kwargs = dict(tx_n=tx_n, nc_max=nc_max)
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, **kwargs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles, nc_max),
            in_specs=[
                pl.BlockSpec(
                    (ROWS_IN, CH),
                    lambda t, k, ps, nch, cnt: (
                        0, _g_index(t, k, ps, nch, n_blocks, True, nc_max)),
                ),
                pl.BlockSpec((1, 4, P), lambda t, k, *_: (t, 0, 0)),
                pl.BlockSpec((1, ROWS_CARR, P), lambda t, k, *_: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (ROWS_IN, CH),
                lambda t, k, ps, nch, cnt: (
                    0, _dg_index(t, k, ps, nch, n_blocks, nc_max)),
            ),
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ROWS_IN, g16.shape[1] + CH), jnp.float32),
        interpret=interpret,
    )(ps, nch, cnt, g16, ct_out, carr)
    # blocks past the used stream prefix are never visited by any grid
    # step: their output memory is uninitialized, not zero
    used_cols = jnp.max(ps + nch) * CH
    dg = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, dg.shape, 1) < used_cols,
        dg, 0.0)
    return dg[:, : g16.shape[1]], None, None, None


blend_stream.defvjp(_stream_fwd, _stream_bwd)
