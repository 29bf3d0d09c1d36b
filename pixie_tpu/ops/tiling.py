"""Spatial tiling for the fast MPM transfer kernels.

On this TPU every dynamic-index primitive (scatter, gather, windowed scatter)
executes as a serial scalar loop (measured: 37ms for one P2G scatter-add at
100k particles, ~14ns/element).  The fast path therefore avoids dynamic
indexing entirely in the per-substep hot loop:

  * particles are kept sorted by spatial TILE (8^3 grid cells), padded per
    tile to PBLK-particle blocks — re-sorted only every O(100) substeps
    (the node window absorbs +/-1 cell of drift between sorts);
  * P2G: a Pallas kernel splats each particle block into its tile's
    12^3-node window via one-hot weighted matmuls in VMEM (ops/transfer.py);
  * per-tile windows combine into the global grid with dense parity-block
    shift-adds (combine_windows) — no scatter;
  * G2P mirrors this: dense window extraction + per-tile gather matmuls.

Window coordinate u maps to grid coordinate TILE*t + u - 1, u in [0, TILE+4):
base cells span the tile (TILE values) plus +/-1 drift, and each base touches
+2 nodes.  Windows are stored padded to WIN_S = 2*TILE so the combine
decomposes into 2^3 parity blocks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Grid cells per tile edge.  The stored window is WIN_S = 16 either way
# (the kernels' pair maps are (PBLK, 16*16) and hardcode the 16-lane split),
# so TILE=12 uses the SAME kernels with a 16/16-valid window instead of
# 12/16 — denser particle packing (fewer padded blocks) and 2.7x fewer
# tiles at a given n_grid, at the cost of less drift slack per resort.
# v5e measurements in docs/DESIGN.md.
TILE = int(os.environ.get("PIXIE_TILE", "12"))
WIN = TILE + 4      # valid node-window extent per axis (drift +/-1 included)
WIN_S = 16          # stored window extent (kernel lane layout)
assert 2 <= TILE <= WIN_S - 4, f"TILE={TILE} needs TILE+4 <= WIN_S=16"
# particles per kernel block (per-tile padding granularity).  Swept on v5e at
# 100k particles / 50^3 grid: 128 -> 70.7 substeps/s, 256 -> 61.3, 512 -> 39.3
# — the kernels are NOT per-program-overhead-bound; smaller blocks pipeline
# better.  Env knob for re-sweeping on new targets.
PBLK = int(os.environ.get("PIXIE_PBLK", "128"))

# Finer z sub-tiling (PIXIE_SLAB=1): particles are additionally sorted into
# SLAB-cell z-slabs within each tile, shrinking the kernels' (y,z) pair maps
# from 16x16=256 to 16x8=128 columns.  The main MXU contractions drop from
# ceil(K/128)*2 to ceil(K/128)*1 passes and the VPU pair construction halves,
# at ~15-25% more blocks (per-sub-tile padding).  SLAB=4 is the only slabbed
# size: 4 own cells + 2 stencil + 2 drift = exactly the 8 stored lanes.
# Default SLAB=TILE reproduces the square-window layout bit-for-bit.
SLAB = 4 if os.environ.get("PIXIE_SLAB", "0") == "1" else TILE
NSLAB = TILE // SLAB          # z sub-tiles (slabs) per tile
ZWIN_S = 8 if NSLAB > 1 else WIN_S   # stored z-window lanes (power of two)
PAIRW = WIN_S * ZWIN_S        # kernel pair-map width (256 or 128)
assert TILE % SLAB == 0 and SLAB + 4 <= ZWIN_S, (TILE, SLAB, ZWIN_S)
# cells per sub-tile-coordinate unit, and max window-relative base (clip
# bound: valid window extent per axis is ORIGIN[a]+4, u0 <= extent-3)
ORIGIN = (TILE, TILE, SLAB)
U0_HI = (TILE + 1, TILE + 1, SLAB + 1)


def n_tiles(n_grid: int) -> int:
    return (n_grid + TILE - 1) // TILE


def base_cell_of(x: jnp.ndarray, inv_dx: float) -> jnp.ndarray:
    return jnp.floor(x * inv_dx - 0.5).astype(jnp.int32)


def tile_id_of(base_cell: jnp.ndarray, n_grid: int) -> jnp.ndarray:
    t = n_tiles(n_grid)
    tc = jnp.clip(base_cell // TILE, 0, t - 1)
    return (tc[:, 0] * t + tc[:, 1]) * t + tc[:, 2]


def build_padded_layout(x: np.ndarray, n_grid: int, inv_dx: float,
                        box: bool = False, box_dims_min=None,
                        n_blocks_min: int = 0, base: np.ndarray | None = None):
    """Host-side layout build (amortized; runs at setup and every resort).

    Returns a dict with:
      perm         (Np,) int32   — source particle index per padded slot
                                    (arbitrary valid index for padding slots)
      occupied     (Np,) f32     — 1 for real particles, 0 for padding
      block_tile   (NB,) int32   — sub-tile id of each PBLK block
                                    (= tile_id * NSLAB + z_slab, box-local
                                    when ``box``)
      tile_coords  (NB, 3) int32 — ABSOLUTE sub-tile coordinates per block;
                                    x/y in tile units, z in SLAB units (origin
                                    cell of axis a = tile_coords[a]*ORIGIN[a])
      box_origin   (3,) ints     — tile-origin of the active box (0 w/o box)
      box_tiles    (3,) ints     — tile extent of the active box (t w/o box)
      n_subtiles   int           — prod(box_tiles) * NSLAB
      n_blocks     int

    ``box=True`` restricts windows, folds, and the blocked grid to the
    occupied-tile bounding box padded by one tile per side (edge-tile windows
    write one node beyond the tile).  At sparse real-scene scale (n_grid=120,
    500k particles in blobs) only ~9% of tiles hold particles: the box cuts
    the ≥1-block-per-empty-sub-tile kernel padding and shrinks every fold
    matmul and grid op by the box/cube volume ratio.  Box dims are rounded
    up to even tile counts and floored at ``box_dims_min`` (the caller's
    running max) so resorts reuse compiled programs — dims are shape-static,
    while the box ORIGIN reaches the jitted substep as a traced array, so a
    box migrating with falling material never recompiles.
    """
    if base is None:
        x = np.asarray(x)
        base = np.floor(x * inv_dx - 0.5).astype(np.int32)
    else:
        # precomputed base cells (e.g. device-computed, fetched as int16:
        # a third the tunnel bytes of the f32 positions) — the only thing
        # the build consumes
        base = np.asarray(base, np.int32)
    t = n_tiles(n_grid)
    tc = np.clip(base // TILE, 0, t - 1)
    slab = np.clip((base[:, 2] - tc[:, 2] * TILE) // SLAB, 0, NSLAB - 1)

    if box:
        lo = np.maximum(tc.min(axis=0) - 1, 0)
        hi = np.minimum(tc.max(axis=0) + 1, t - 1)
        dims = np.minimum(-(-(hi - lo + 1) // 2) * 2, t)  # even-bucketed
        if box_dims_min is not None:
            dims = np.minimum(np.maximum(dims, np.asarray(box_dims_min)), t)
        lo = np.maximum(0, np.minimum(lo, t - dims))      # keep box in-grid
        box_origin = tuple(int(v) for v in lo)
        box_tiles = tuple(int(v) for v in dims)
    else:
        box_origin = (0, 0, 0)
        box_tiles = (t, t, t)
    bo = np.asarray(box_origin)
    bt_dims = np.asarray(box_tiles)
    tcl = tc - bo  # box-local tile coords
    tid = ((tcl[:, 0] * bt_dims[1] + tcl[:, 1]) * bt_dims[2]
           + tcl[:, 2]) * NSLAB + slab
    order = np.argsort(tid, kind="stable")
    tid_sorted = tid[order]
    n_sub = int(bt_dims.prod()) * NSLAB

    # every sub-tile gets >= 1 block: a sub-tile with no program writing its
    # output window would leave that window uninitialized (the kernel
    # accumulates in-place and only the first program of a tile zeroes it)
    counts = np.zeros(n_sub, np.int64)
    uniq, uniq_counts = np.unique(tid_sorted, return_counts=True)
    counts[uniq] = uniq_counts
    starts_src = np.zeros(n_sub, np.int64)
    starts_src[uniq] = np.cumsum(uniq_counts) - uniq_counts
    blocks_per_tile = np.maximum((counts + PBLK - 1) // PBLK, 1)
    n_real_blocks = int(blocks_per_tile.sum())
    # bucket the block count so re-sorts reuse compiled programs; filler
    # blocks extend the last sub-tile (all-padding, accumulate zeros).
    # ``n_blocks_min`` (the caller's running max) keeps the count monotone:
    # a settling scene whose real block count oscillates across a bucket
    # boundary would otherwise alternate program shapes every resort, each
    # flip paying a Mosaic compile (or a multi-second remote cache load)
    bucket = 128
    n_blocks = max(int(-(-n_real_blocks // bucket) * bucket),
                   int(n_blocks_min))
    blocks_per_tile[n_sub - 1] += n_blocks - n_real_blocks

    perm = np.zeros(n_blocks * PBLK, np.int32)
    occupied = np.zeros(n_blocks * PBLK, np.float32)
    block_tile = np.zeros(n_blocks, np.int32)

    blk = 0
    for u in range(n_sub):
        c = counts[u]
        src = starts_src[u]
        for b in range(int(blocks_per_tile[u])):
            take = int(min(PBLK, max(c - b * PBLK, 0)))
            s = blk * PBLK
            if take:
                perm[s : s + take] = order[src + b * PBLK : src + b * PBLK + take]
                occupied[s : s + take] = 1.0
            block_tile[blk] = u
            blk += 1
    bt = block_tile // NSLAB  # box-local tile id
    bx, by, bz = box_tiles
    txc = bt // (by * bz) + box_origin[0]
    tyc = (bt // bz) % by + box_origin[1]
    tzc = bt % bz + box_origin[2]
    tc_of = np.stack([
        txc, tyc,
        tzc * NSLAB + block_tile % NSLAB,        # z sub-tile (slab units)
    ], -1)
    return {
        "perm": jnp.asarray(perm),
        "occupied": jnp.asarray(occupied),
        "block_tile": jnp.asarray(block_tile),
        "tile_coords": jnp.asarray(tc_of.astype(np.int32)),
        "box_origin": box_origin,
        "box_tiles": box_tiles,
        "n_subtiles": n_sub,
        "n_blocks": n_blocks,
        # host copies (free — built in numpy): unpad/compose consume these
        # instead of fetching perm/occupied back over the tunnel
        "perm_np": perm,
        "occupied_np": occupied,
    }


def combine_windows(windows: jnp.ndarray, n_grid: int, n_channels: int) -> jnp.ndarray:
    """Dense combine: per-tile (T,T,T, WIN_S,WIN_S,WIN_S, C) windows ->
    (G,G,G,C) grid; window u -> grid TILE*t + u - 1.  Routed through the
    blocked slice-based combine (general in TILE); linear-path/tests only."""
    assert NSLAB == 1, "linear combine path requires square windows (no slab)"
    t = n_tiles(n_grid)
    w = windows.reshape(t, t, t, WIN_S, WIN_S, WIN_S, n_channels)
    w = jnp.moveaxis(w, -1, 3)  # (t,t,t,C,WIN_S,WIN_S,WIN_S)
    blocked = combine_windows_blocked(w, n_channels)
    return blocked_to_linear(blocked, n_grid)


def extract_windows(grid: jnp.ndarray, n_grid: int) -> jnp.ndarray:
    """Adjoint: (G,G,G,C) -> per-tile (T,T,T, WIN_S,WIN_S,WIN_S, C) windows;
    windows[t, u] = grid[TILE*t + u - 1] (zero outside)."""
    assert NSLAB == 1, "linear extract path requires square windows (no slab)"
    blocked = linear_to_blocked(grid, n_grid)
    w = extract_windows_blocked(blocked)
    return jnp.moveaxis(w, 3, -1)  # (t,t,t,WIN_S,WIN_S,WIN_S,C)


# ---------------------------------------------------------------------------
# Blocked-grid combine/extract: the grid stays in tile-blocked layout
# (t,t,t, TILE,TILE,TILE, C) through the whole substep, so merging windows
# and re-extracting them is pure static slicing — no interleaving transposes
# (measured ~5 ms/substep of reshape/copy fusions with the linear layout).
# Window u maps to cell TILE*tw + u - 1: per axis a block coordinate b of
# tile tx receives W[tx, b+1] + W[tx-1, b+1+TILE] (b <= TILE-2-? ) +
# W[tx+1, 0] (b == TILE-1 only); 3^3 sliced terms total.
# ---------------------------------------------------------------------------

def _zeros_like_shape(a, axis, size):
    shape = list(a.shape)
    shape[axis] = size
    return jnp.zeros(shape, a.dtype)


def _tile_shift(a, tile_axis, direction):
    """a shifted along a tile axis: out[i] = a[i + direction], zero-filled."""
    t = a.shape[tile_axis]
    zero = _zeros_like_shape(a, tile_axis, 1)
    if direction == 1:
        body = jax.lax.slice_in_dim(a, 1, t, axis=tile_axis)
        return jnp.concatenate([body, zero], axis=tile_axis)
    body = jax.lax.slice_in_dim(a, 0, t - 1, axis=tile_axis)
    return jnp.concatenate([zero, body], axis=tile_axis)


def _expand_axis(g, tile_axis, block_axis):
    """Blocked axis (t tiles x TILE blocks) -> window axis (WIN_S) per tile:
    W[tw, u] = G[tw + s(u), b(u)] with u=0 -> (tw-1, TILE-1), u in [1,TILE]
    -> (tw, u-1), u in [TILE+1, 2*TILE) -> (tw+1, u-TILE-1).

    Pure slice/concat — no scatter, no dynamic-update-slice."""
    bsl = lambda a, lo, hi: jax.lax.slice_in_dim(a, lo, hi, axis=block_axis)
    piece0 = bsl(_tile_shift(g, tile_axis, -1), TILE - 1, TILE)      # u = 0
    piece1 = g                                                        # u = 1..TILE
    # u = TILE+1 .. WIN_S-1 come from the next tile's low cells
    piece2 = bsl(_tile_shift(g, tile_axis, 1), 0, WIN_S - TILE - 1)
    return jnp.concatenate([piece0, piece1, piece2], axis=block_axis)


def _reduce_axis(w, tile_axis, u_axis):
    """Adjoint of _expand_axis: window axis (WIN_S) -> blocked axis (TILE)."""
    usl = lambda a, lo, hi: jax.lax.slice_in_dim(a, lo, hi, axis=u_axis)
    pad_cfg = [(0, 0, 0)] * w.ndim

    mid = usl(w, 1, TILE + 1)                              # own tile
    # W[tx, u in TILE+1..WIN_S-1] -> B[tx+1, b=0..WIN_S-TILE-2]: shift down
    from_prev = _tile_shift(usl(w, TILE + 1, WIN_S), tile_axis, -1)
    cfg = list(pad_cfg)
    cfg[u_axis] = (0, TILE - (WIN_S - TILE - 1), 0)
    from_prev = jax.lax.pad(from_prev, jnp.zeros((), w.dtype), cfg)
    # W[tx, u=0] -> B[tx-1, b=TILE-1]: shift tiles up
    from_next = _tile_shift(usl(w, 0, 1), tile_axis, 1)
    cfg = list(pad_cfg)
    cfg[u_axis] = (TILE - 1, 0, 0)
    from_next = jax.lax.pad(from_next, jnp.zeros((), w.dtype), cfg)
    return mid + from_prev + from_next


def combine_windows_blocked(windows: jnp.ndarray, ch_axis_len: int) -> jnp.ndarray:
    """(t,t,t, C, WIN_S,WIN_S,WIN_S) windows -> blocked grid
    (t,t,t, C, TILE,TILE,TILE); channel axis stays at position 3.
    Window u maps to grid cell TILE*tw + u - 1."""
    out = _reduce_axis(windows, tile_axis=0, u_axis=4)
    out = _reduce_axis(out, tile_axis=1, u_axis=5)
    out = _reduce_axis(out, tile_axis=2, u_axis=6)
    return out


def extract_windows_blocked(grid_blocked: jnp.ndarray) -> jnp.ndarray:
    """Adjoint: blocked grid (t,t,t,C,TILE,TILE,TILE) -> windows
    (t,t,t,C,WIN_S,WIN_S,WIN_S)."""
    out = _expand_axis(grid_blocked, tile_axis=0, block_axis=4)
    out = _expand_axis(out, tile_axis=1, block_axis=5)
    out = _expand_axis(out, tile_axis=2, block_axis=6)
    return out


# ---------------------------------------------------------------------------
# Matmul-fold combine/extract: the fold window->blocked (and its adjoint) is
# a LINEAR map along each window axis, so it can run as matmuls with constant
# 0/1 matrices acting directly on the kernels' native (T3, rows, 256) layout.
# The slice-based combine/extract above runs the minor (lane/sublane) axes
# through 1..8-offset slices, which Mosaic/XLA lower as lane-rotate + select
# chains (~4.5 ms/substep at n_grid=50 — the dominant non-kernel cost);
# the matmul form is ~10 GFLOP of MXU work instead (sub-ms).  Cross-tile
# halo terms ride tile shifts on MAJOR axes (full-register copies).
# Window u of tile tw covers grid cell TILE*tw + u - 1 = TILE*tw' + b.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fold_mats():
    """(own, prev, nxt): (WIN_S, TILE) 0/1 fold matrices.

    B[tw', b] = sum_u own[u, b] W[tw', u] + prev[u, b] W[tw'-1, u]
                + nxt[u, b] W[tw'+1, u]
    """
    own = np.zeros((WIN_S, TILE), np.float32)
    for b in range(TILE):
        own[b + 1, b] = 1.0          # u = b+1 on the same tile
    prev = np.zeros((WIN_S, TILE), np.float32)
    for b in range(WIN_S - TILE - 1):
        prev[b + TILE + 1, b] = 1.0  # high window cells of tile tw'-1
    nxt = np.zeros((WIN_S, TILE), np.float32)
    nxt[0, TILE - 1] = 1.0           # u=0 of tile tw'+1 -> b = TILE-1
    return own, prev, nxt


@functools.lru_cache(maxsize=None)
def _fold_mats_z():
    """Per-slab (NSLAB, ZWIN_S, TILE) 0/1 z-fold matrices (own, prev, nxt).

    Window lane u of slab s covers grid cell TILE*tz + SLAB*s + u - 1;
    prev/nxt carry the halo contributions from tile tz-1 / tz+1.  For
    NSLAB == 1 these equal _fold_mats() exactly."""
    own = np.zeros((NSLAB, ZWIN_S, TILE), np.float32)
    prev = np.zeros((NSLAB, ZWIN_S, TILE), np.float32)
    nxt = np.zeros((NSLAB, ZWIN_S, TILE), np.float32)
    for s in range(NSLAB):
        for u in range(min(SLAB + 4, ZWIN_S)):
            b = SLAB * s + u - 1
            if 0 <= b < TILE:
                own[s, u, b] = 1.0
            if 0 <= b - TILE < TILE:
                prev[s, u, b - TILE] = 1.0
            if 0 <= b + TILE < TILE:
                nxt[s, u, b + TILE] = 1.0
    return own, prev, nxt


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fold_cols_zy(w: jnp.ndarray) -> jnp.ndarray:
    """z+y column folds of the mm combine, local in any x extent.

    w: (X, ty, tz, NSLAB, n_ch*WIN_S, WIN_S*ZWIN_S) -> (X, ty, tz,
    n_ch*WIN_S, WIN_S*TILE); the z/y tile shifts ride axes 2/1, which are
    never sharded (y/z tile extents may differ under the active-box layout).
    """
    own, prev, nxt = _fold_mats()
    own_z, prev_z, nxt_z = _fold_mats_z()
    eye_w = np.eye(WIN_S, dtype=np.float32)
    eye_t = np.eye(TILE, dtype=np.float32)
    nx, ty, tz = w.shape[0], w.shape[1], w.shape[2]
    rows = w.shape[4]

    # z fold on cols: (uy,uz) -> (uy,bz); sum over slabs, skipping all-zero
    # halo matrices (prev terms only from the top slab, nxt only from s=0)
    g = jnp.zeros((nx, ty, tz, rows, WIN_S * TILE), jnp.float32)
    for s in range(NSLAB):
        ws = w[:, :, :, s]
        g = g + _mm(ws, jnp.asarray(np.kron(eye_w, own_z[s])))
        if prev_z[s].any():
            g = g + _mm(_tile_shift(ws, 2, -1),
                        jnp.asarray(np.kron(eye_w, prev_z[s])))
        if nxt_z[s].any():
            g = g + _mm(_tile_shift(ws, 2, 1),
                        jnp.asarray(np.kron(eye_w, nxt_z[s])))
    # y fold on cols: (uy,bz) -> (by,bz)
    my = [jnp.asarray(np.kron(m, eye_t)) for m in (own, prev, nxt)]
    return (_mm(g, my[0]) + _mm(_tile_shift(g, 1, -1), my[1])
            + _mm(_tile_shift(g, 1, 1), my[2]))


def _lfold(m, a):
    """Left-multiply a (WIN_S, TILE) fold matrix against the ux axis of
    (X, t, t, n_ch, WIN_S, TILE*TILE) -> (TILE, X, t, t, n_ch, TILE*TILE)."""
    return jax.lax.dot_general(
        jnp.asarray(m.T), a, (((1,), (4,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def combine_windows_mm(windows: jnp.ndarray, tdims, n_ch: int) -> jnp.ndarray:
    """Kernel-native (prod(tdims)*NSLAB, n_ch*WIN_S, WIN_S*ZWIN_S) windows ->
    blocked grid (tx,ty,tz, n_ch, TILE,TILE,TILE).  Rows are (channel, ux);
    cols (uy, uz); sub-tile id = box-local tile_id * NSLAB + z_slab.
    ``tdims``: int (cube) or (tx, ty, tz) tile extents (active-box layout)."""
    tx, ty, tz = (tdims,) * 3 if isinstance(tdims, int) else tdims
    own, prev, nxt = _fold_mats()
    w = windows.reshape(tx, ty, tz, NSLAB, n_ch * WIN_S, WIN_S * ZWIN_S)
    g = _fold_cols_zy(w)
    # x fold on rows: left-multiply (TILE, WIN_S) against the ux axis
    g = g.reshape(tx, ty, tz, n_ch, WIN_S, TILE * TILE)
    gx = (_lfold(own, g) + _lfold(prev, _tile_shift(g, 0, -1))
          + _lfold(nxt, _tile_shift(g, 0, 1)))
    gx = jnp.transpose(gx, (1, 2, 3, 4, 0, 5))
    return gx.reshape(tx, ty, tz, n_ch, TILE, TILE, TILE)


def combine_windows_mm_halo(windows: jnp.ndarray, nx: int, t: int, n_ch: int,
                            axis_name: str, n_dev: int) -> jnp.ndarray:
    """x-slab-sharded combine: per-device kernel-native windows of its nx
    x-tiles -> its local blocked grid (nx,t,t, n_ch, TILE,TILE,TILE).

    The z/y folds are local; the x fold's cross-tile terms at the slab
    boundary ride TWO one-plane ``ppermute``s (window contributions of the
    edge tiles), replacing the full-grid psum of the replicated path —
    comm/substep = 2 planes of (t,t,n_ch,TILE^3) instead of nx*n_dev of
    them allreduced (sim/solver_dist.py docstring has the volume math)."""
    own, prev, nxt = _fold_mats()
    w = windows.reshape(nx, t, t, NSLAB, n_ch * WIN_S, WIN_S * ZWIN_S)
    g = _fold_cols_zy(w)
    g = g.reshape(nx, t, t, n_ch, WIN_S, TILE * TILE)
    own_t = _lfold(own, g)     # W[i] -> B[i]          (TILE, nx, t, t, C, .)
    prv_t = _lfold(prev, g)    # W[i] -> B[i+1]
    nxt_t = _lfold(nxt, g)     # W[i] -> B[i-1]
    gx = (own_t + _tile_shift(prv_t, 1, -1) + _tile_shift(nxt_t, 1, 1))
    # cross-device halo: my edge windows' out-of-range contributions go to
    # the neighbors; theirs arrive into my edge planes
    right = [(i, i + 1) for i in range(n_dev - 1)]
    left = [(i, i - 1) for i in range(1, n_dev)]
    from_left = jax.lax.ppermute(prv_t[:, -1], axis_name, right)
    from_right = jax.lax.ppermute(nxt_t[:, 0], axis_name, left)
    gx = gx.at[:, 0].add(from_left).at[:, -1].add(from_right)
    gx = jnp.transpose(gx, (1, 2, 3, 4, 0, 5))
    return gx.reshape(nx, t, t, n_ch, TILE, TILE, TILE)


def _lexp(m, a):
    """Adjoint of _lfold: (WIN_S, TILE) against the bx axis of
    (X, t, t, n_ch, TILE, TILE*TILE) -> (WIN_S, X, t, t, n_ch, TILE*TILE)."""
    return jax.lax.dot_general(
        jnp.asarray(m), a, (((1,), (4,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _expand_cols_yz(w: jnp.ndarray, n_ch: int) -> jnp.ndarray:
    """y+z column expands of the mm extract, local in any x extent.

    w: (X, ty, tz, n_ch*WIN_S, TILE*TILE) -> kernel-native
    (X*ty*tz*NSLAB, n_ch*WIN_S, WIN_S*ZWIN_S)."""
    own, prev, nxt = _fold_mats()
    own_z, prev_z, nxt_z = _fold_mats_z()
    eye_w = np.eye(WIN_S, dtype=np.float32)
    eye_t = np.eye(TILE, dtype=np.float32)
    nx, ty, tz = w.shape[0], w.shape[1], w.shape[2]

    # y expand on cols: (by,bz) -> (uy,bz).  W[tw] = own^T G[tw]
    # + nxt^T G[tw-1] + prev^T G[tw+1].
    my = [jnp.asarray(np.kron(m.T, eye_t)) for m in (own, nxt, prev)]
    w = (_mm(w, my[0]) + _mm(_tile_shift(w, 1, -1), my[1])
         + _mm(_tile_shift(w, 1, 1), my[2]))
    # z expand on cols: (uy,bz) -> (uy,uz) per slab
    slabs = []
    for s in range(NSLAB):
        ws = _mm(w, jnp.asarray(np.kron(eye_w, own_z[s].T)))
        if nxt_z[s].any():
            ws = ws + _mm(_tile_shift(w, 2, -1),
                          jnp.asarray(np.kron(eye_w, nxt_z[s].T)))
        if prev_z[s].any():
            ws = ws + _mm(_tile_shift(w, 2, 1),
                          jnp.asarray(np.kron(eye_w, prev_z[s].T)))
        slabs.append(ws)
    w = slabs[0] if NSLAB == 1 else jnp.stack(slabs, axis=3)
    return w.reshape(nx * ty * tz * NSLAB, n_ch * WIN_S, WIN_S * ZWIN_S)


def extract_windows_mm(grid_blocked: jnp.ndarray) -> jnp.ndarray:
    """Adjoint: blocked grid (tx,ty,tz, n_ch, TILE,TILE,TILE) -> kernel-native
    windows (prod(tdims)*NSLAB, n_ch*WIN_S, WIN_S*ZWIN_S)."""
    tx, ty, tz = grid_blocked.shape[:3]
    n_ch = grid_blocked.shape[3]
    own, prev, nxt = _fold_mats()

    g = grid_blocked.reshape(tx, ty, tz, n_ch, TILE, TILE * TILE)
    # x expand on rows: W[tw, u] picks b=u-1 own / b=u+7 of tw-1 / b=0 of tw+1
    w = (_lexp(own, g) + _lexp(nxt, _tile_shift(g, 0, -1))
         + _lexp(prev, _tile_shift(g, 0, 1)))
    w = jnp.transpose(w, (1, 2, 3, 4, 0, 5))
    w = w.reshape(tx, ty, tz, n_ch * WIN_S, TILE * TILE)
    return _expand_cols_yz(w, n_ch)


def extract_windows_mm_halo(grid_blocked: jnp.ndarray, t: int, n_ch: int,
                            axis_name: str, n_dev: int) -> jnp.ndarray:
    """x-slab-sharded adjoint: local blocked grid (nx,t,t,n_ch,TILE^3) ->
    the device's kernel-native windows; the x expand needs the neighbors'
    edge grid planes — TWO one-plane ``ppermute``s per substep."""
    own, prev, nxt = _fold_mats()
    nx = grid_blocked.shape[0]
    g = grid_blocked.reshape(nx, t, t, n_ch, TILE, TILE * TILE)
    right = [(i, i + 1) for i in range(n_dev - 1)]
    left = [(i, i - 1) for i in range(1, n_dev)]
    g_left = jax.lax.ppermute(g[-1], axis_name, right)   # neighbor's last
    g_right = jax.lax.ppermute(g[0], axis_name, left)    # neighbor's first
    g_ext = jnp.concatenate([g_left[None], g, g_right[None]], axis=0)
    # W[i] = own^T G[i] + nxt^T G[i-1] + prev^T G[i+1] (ext index i+1)
    w = (_lexp(own, g_ext[1:-1]) + _lexp(nxt, g_ext[:-2])
         + _lexp(prev, g_ext[2:]))
    w = jnp.transpose(w, (1, 2, 3, 4, 0, 5))
    w = w.reshape(nx, t, t, n_ch * WIN_S, TILE * TILE)
    return _expand_cols_yz(w, n_ch)


def blocked_to_linear(grid_blocked: jnp.ndarray, n_grid: int) -> jnp.ndarray:
    """(t,t,t,C,8,8,8) -> (G,G,G,C) (for exports/tests; involves transposes —
    not used in the hot loop)."""
    t = grid_blocked.shape[0]
    c = grid_blocked.shape[3]
    g = grid_blocked.transpose(0, 4, 1, 5, 2, 6, 3).reshape(
        t * TILE, t * TILE, t * TILE, c
    )
    return g[:n_grid, :n_grid, :n_grid]


def linear_to_blocked(grid: jnp.ndarray, n_grid: int) -> jnp.ndarray:
    t = n_tiles(n_grid)
    c = grid.shape[-1]
    g_pad = t * TILE
    padded = jnp.zeros((g_pad, g_pad, g_pad, c), grid.dtype)
    padded = padded.at[:n_grid, :n_grid, :n_grid].set(grid)
    return padded.reshape(t, TILE, t, TILE, t, TILE, c).transpose(0, 2, 4, 6, 1, 3, 5)
