"""Differentiable Gaussian-splat rasterizer (diff-gaussian-rasterization port).

Reference: cuda_rasterizer/forward.cu (preprocessCUDA:156 — EWA projection of
3D covariance to 2D, SH->RGB; renderCUDA:262 — per-tile front-to-back alpha
blending of depth-sorted gaussians) and backward.cu.  The CUDA version
duplicates keys per (tile, depth) and radix-sorts; per-pixel threads then
walk their tile's range.

TPU-first redesign, two paths:

``rasterize``        — one global depth sort + a ``lax.scan`` over fixed
                       gaussian chunks blending against the whole image
                       (dense O(N*H*W); exact; the small-scene oracle).
``rasterize_tiled``  — the scalable path mirroring the CUDA tile pipeline
                       (rasterizer_impl.cu:70-116 duplicateWithKeys /
                       identifyTileRanges) with TPU-native machinery:
                       global depth sort -> fixed-fanout (tile,gaussian) key
                       duplication over each splat's 3-sigma tile bbox ->
                       ONE ``lax.sort`` of integer keys -> per-tile
                       capacity-capped index lists via searchsorted ->
                       dense per-tile front-to-back blending vectorized over
                       all tiles.  The tile gather uses a custom VJP whose
                       backward is a sort + cumsum segment-reduction —
                       scatter-free, because TPU scatter-adds serialize
                       (docs/DESIGN.md).

Approximations of the tiled path vs the dense oracle (both bounded and
configurable): a splat contributes to at most ``max_tiles_side``^2 tiles
around its bbox, and each tile blends its closest ``tile_cap`` splats in
exact depth order; both truncations are measured in tests.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pixie_tpu.recon import gaussians as G


@dataclasses.dataclass(frozen=True)
class Camera:
    height: int
    width: int
    fx: float
    fy: float
    cx: float
    cy: float

    @staticmethod
    def from_fov(height, width, fovx, fovy):
        import math

        fx = width / (2.0 * math.tan(fovx / 2.0))
        fy = height / (2.0 * math.tan(fovy / 2.0))
        return Camera(height, width, fx, fy, width / 2.0, height / 2.0)


_PACK6 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def congruence6(r):
    """(6,6) matrix T such that packed(R C R^T) = packed(C) @ T.T for any
    symmetric C packed upper-triangular [c00,c01,c02,c11,c12,c22].

    D_ab = sum_ij R_ai R_bj C_ij is linear in the 6 packed entries:
    T[p,q] = R_ai R_bj + R_aj R_bi (i<j) or R_ai R_bi (i==j), with
    p=(a,b), q=(i,j) over the packed index order.  Works for traced jnp
    and host numpy 3x3 inputs alike."""
    rows = []
    for a, b in _PACK6:
        row = []
        for i, j in _PACK6:
            v = r[a, i] * r[b, j]
            if i != j:
                v = v + r[a, j] * r[b, i]
            row.append(v)
        rows.append(row)
    if hasattr(r, "aval") or isinstance(r, jnp.ndarray):
        return jnp.stack([jnp.stack(row) for row in rows])
    import numpy as _np

    return _np.array(rows, dtype=_np.asarray(r).dtype)


def project_gaussians(params, viewmat, cam: Camera, scaling_modifier=1.0):
    """World gaussians -> screen: means2D, 2D covariance, depth, rgb, opacity.

    EWA splatting as in preprocessCUDA (forward.cu:74-155): cov2D =
    J W Sigma W^T J^T with a +0.3 pixel blur on the diagonal.

    Precomputed inputs (the reference rasterizer's cov3D_precomp /
    colors_precomp / opacities contract, gaussian_renderer/__init__.py and
    gs_simulation.py:612-620) are honored when present in ``params``:
      ``cov3d_precomp``   (N,3,3) world covariance (skips scale+quat)
      ``colors_precomp``  (N,3)   view-ready RGB (skips SH eval)
      ``opacity_precomp`` (N,) or (N,1) activated opacity (skips sigmoid)
    """
    xyz = params["xyz"]
    n = xyz.shape[0]
    r = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = xyz @ r.T + t  # (N,3), camera looks down +z
    depth = p_cam[:, 2]

    x, y, z = p_cam[:, 0], p_cam[:, 1], jnp.maximum(p_cam[:, 2], 1e-4)
    means2d = jnp.stack(
        [cam.fx * x / z + cam.cx, cam.fy * y / z + cam.cy], axis=-1
    )

    if "cov6_precomp" in params:
        cov6 = params["cov6_precomp"] * (scaling_modifier ** 2)
    elif "cov3d_precomp" in params:
        m = params["cov3d_precomp"] * (scaling_modifier ** 2)
        cov6 = jnp.stack([m[:, 0, 0], m[:, 0, 1], m[:, 0, 2],
                          m[:, 1, 1], m[:, 1, 2], m[:, 2, 2]], -1)
    else:
        cov6 = G.covariance_upper(params, scaling_modifier)
    # camera-frame covariance as ONE (N,6) x (6,6) contraction: a batched
    # (N,3,3) einsum lowers as 3x3 matmuls padding the lane axis 3->128
    # (docs/DESIGN.md / sim/mat3.py rule: never einsum (N,3,3) batches)
    cov_cam6 = cov6 @ congruence6(r).T
    # Jacobian of perspective projection (forward.cu:91-103)
    j00 = cam.fx / z
    j02 = -cam.fx * x / (z * z)
    j11 = cam.fy / z
    j12 = -cam.fy * y / (z * z)
    a, b, c = cov_cam6[:, 0], cov_cam6[:, 1], cov_cam6[:, 2]
    d, e = cov_cam6[:, 3], cov_cam6[:, 4]
    f = cov_cam6[:, 5]
    c00 = j00 * (j00 * a + j02 * c) + j02 * (j00 * c + j02 * f)
    c01 = j00 * (j11 * b + j12 * c) + j02 * (j11 * e + j12 * f)
    c11 = j11 * (j11 * d + j12 * e) + j12 * (j11 * e + j12 * f)
    c00 = c00 + 0.3
    c11 = c11 + 0.3

    # view-dir SH color (forward.cu computeColorFromSH)
    if "colors_precomp" in params:
        rgb = params["colors_precomp"]
    else:
        cam_pos = -r.T @ t
        dirs = xyz - cam_pos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        shs = G.get_shs(params)
        degree = {1: 0, 4: 1, 9: 2, 16: 3}.get(shs.shape[1], 3)
        rgb = jnp.clip(G.eval_sh(shs, dirs, degree), 0.0, None)

    if "opacity_precomp" in params:
        opacity = params["opacity_precomp"].reshape(-1)
    else:
        opacity = G.get_opacity(params)[:, 0]
    # cull behind-camera gaussians
    valid = depth > 0.01
    opacity = jnp.where(valid, opacity, 0.0)
    return means2d, jnp.stack([c00, c01, c11], -1), depth, rgb, opacity


@functools.partial(jax.jit, static_argnames=("cam", "chunk"))
def rasterize(params, viewmat, cam: Camera, bg_color=1.0, scaling_modifier=1.0,
              chunk: int = 256, mean2d_offset=None):
    """Render (H, W, 3) image + alpha via global-sort + chunked blending.

    mean2d_offset (N,2): a zeros tensor whose gradient gives per-gaussian
    screen-space gradients (the densification signal; replaces the
    reference's retain_grad on means2D, train.py:106-112)."""
    means2d, cov2d, depth, rgb, opacity = project_gaussians(
        params, viewmat, cam, scaling_modifier
    )
    if mean2d_offset is not None:
        means2d = means2d + mean2d_offset
    n = means2d.shape[0]
    pad = (-n) % chunk
    order = _argsort_f32(depth)
    packed = _chunked_row_gather(
        jnp.concatenate([means2d, cov2d, rgb, opacity[:, None]], axis=-1),
        order,
    )
    means2d = jnp.pad(packed[:, 0:2], ((0, pad), (0, 0)))
    cov2d = jnp.pad(packed[:, 2:5], ((0, pad), (0, 0)), constant_values=1.0)
    rgb = jnp.pad(packed[:, 5:8], ((0, pad), (0, 0)))
    opacity = jnp.pad(packed[:, 8], ((0, pad),))

    # inverse 2D covariance (conic, forward.cu:222-230)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det = jnp.maximum(det, 1e-8)
    conic = jnp.stack(
        [cov2d[:, 2] / det, -cov2d[:, 1] / det, cov2d[:, 0] / det], -1
    )

    px = jnp.arange(cam.width, dtype=jnp.float32) + 0.5
    py = jnp.arange(cam.height, dtype=jnp.float32) + 0.5
    grid_x, grid_y = jnp.meshgrid(px, py, indexing="xy")  # (H, W)

    nc = means2d.shape[0] // chunk
    m2 = means2d.reshape(nc, chunk, 2)
    co = conic.reshape(nc, chunk, 3)
    cg = rgb.reshape(nc, chunk, 3)
    op = opacity.reshape(nc, chunk)

    def blend_chunk(carry, inp):
        color_acc, trans = carry
        m, cn, col, o = inp
        dx = grid_x[..., None] - m[None, None, :, 0]  # (H, W, C)
        dy = grid_y[..., None] - m[None, None, :, 1]
        power = -0.5 * (cn[None, None, :, 0] * dx * dx
                        + cn[None, None, :, 2] * dy * dy) \
            - cn[None, None, :, 1] * dx * dy
        alpha = jnp.minimum(o[None, None, :] * jnp.exp(jnp.minimum(power, 0.0)),
                            0.99)
        alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)  # skip tiny (forward.cu:316)
        one_minus = 1.0 - alpha
        # exclusive within-chunk transmittance (cum/one_minus: see tiled path)
        cum = jnp.cumprod(one_minus, axis=-1)
        w = alpha * (cum / one_minus) * trans[..., None]
        color_acc = color_acc + jnp.stack(
            [jnp.sum(w * col[None, None, :, e], axis=-1) for e in range(3)],
            axis=-1,
        )
        trans = trans * cum[..., -1]
        return (color_acc, trans), None

    init = (
        jnp.zeros((cam.height, cam.width, 3), jnp.float32),
        jnp.ones((cam.height, cam.width), jnp.float32),
    )
    (color, trans), _ = jax.lax.scan(
        jax.checkpoint(blend_chunk), init, (m2, co, cg, op)
    )
    color = color + bg_color * trans[..., None]
    return color, 1.0 - trans


# ---------------------------------------------------------------------------
# tiled path
# ---------------------------------------------------------------------------

# TPU sort constraints (measured on v5e): 1-operand int sorts and 2-operand
# (f32 key, i32 payload) sorts lower cleanly; variadic sorts with >=3
# operands (or argsort followed by a multi-column row gather of COMPUTED
# data) make the backend materialize a dense (N, N+F) temp — 40 GB at 100k
# splats — or hang the compiler.  The tiled pipeline therefore never
# permutes gaussian rows: only (f32, iota) argsorts, one big 1-op int key
# sort, and an O(N) scatter-set for the inverse permutation.


def _argsort_f32(key):
    """(f32 key, iota) 2-op sort -> permutation (the one proven-safe
    argsort shape on this backend)."""
    n = key.shape[0]
    return jax.lax.sort(
        (key.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1,
    )[1]


def _inverse_permutation(perm):
    """rank[perm[i]] = i, computed as argsort(perm).

    NOT a scatter-set: TPU scatters serialize at ~1.25 us/update (measured
    137 ms at 100k — docs/DESIGN.md), while a (f32-cast, iota) sort is
    ~1 ms.  Exact for perm values < 2^24."""
    return _argsort_f32(perm)


def _chunked_row_gather(data, idx, width: int = 3):
    """data (N, F) gathered at idx (...,) in ``width``-column chunks.

    Gather lowering on this backend is shape-sensitive: full (N, 9) row
    gathers of computed operands either trigger a dense (N, N+F) rewrite
    (compile-time OOM) or run ~500x slower than narrow gathers (139 ms vs
    0.3 ms at 1.28M rows measured); <=4-column chunks are fast and safe."""
    f = data.shape[-1]
    return jnp.concatenate(
        [data[:, i : i + width][idx] for i in range(0, f, width)], axis=-1
    )


@jax.custom_vjp
def _tile_gather(data, gidx):
    """data (N, F) gathered at gidx (T, C) -> (T, C, F).

    Forward is a chunked row gather.  The backward avoids XLA's serial
    scatter-add: flatten the cotangents, sort them by gaussian index,
    cumsum, and difference at segment boundaries found with searchsorted."""
    return _chunked_row_gather(data, gidx)


def _tile_gather_fwd(data, gidx):
    return _chunked_row_gather(data, gidx), (gidx, data.shape[0])


def _tile_gather_bwd(res, ct):
    gidx, n = res
    f = ct.shape[-1]
    flat_idx = gidx.reshape(-1)
    flat_ct = ct.reshape(-1, f)
    # (f32-cast key, iota) argsort — exact for indices < 2^24.  All gathers
    # below are COLUMN-WISE 1-D: multi-column row gathers of computed data
    # trigger the backend's dense (M, M) lowering (see module comment).
    # segment [lo_i, hi_i) of rows belonging to gaussian i, via histogram +
    # exclusive cumsum: a searchsorted binary search here runs ~21 serial
    # gather rounds over the sorted index list (~137 ms/step measured);
    # the one bincount scatter-add is ~18 ms
    counts = jnp.zeros((n,), jnp.int32).at[flat_idx].add(
        1, mode="promise_in_bounds")
    hi = jnp.cumsum(counts)
    lo = hi - counts
    # sort each cotangent column by gaussian index with STABLE 2-op
    # (f32-key, payload) sorts — ~2.5 ms each vs ~21 ms per chunked row
    # gather of the same data at 1.28M rows
    key = flat_idx.astype(jnp.float32)
    sct = jnp.stack(
        [jax.lax.sort((key, flat_ct[:, i]), num_keys=1)[1] for i in range(f)],
        axis=1,
    )
    csum = jnp.concatenate(
        [jnp.zeros((1, f), jnp.float32), jnp.cumsum(
            sct.astype(jnp.float32), axis=0)], axis=0)
    boundary = _chunked_row_gather(csum, hi) - _chunked_row_gather(csum, lo)
    return boundary.astype(ct.dtype), None


_tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile", "tile_cap", "max_tiles_side", "chunk",
                     "use_pallas_blend", "stream_cap"),
)
def rasterize_tiled(params, viewmat, cam: Camera, bg_color=1.0,
                    scaling_modifier=1.0, tile: int = 16, tile_cap: int = 512,
                    max_tiles_side: int = 6, chunk: int = 128,
                    mean2d_offset=None, use_pallas_blend: bool | None = None,
                    stream_cap: int | None = 0):
    """Tile-culled differentiable rasterization (the reference's tile
    pipeline, rasterizer_impl.cu:70-116, as dense XLA).

    Returns (image (H,W,3), alpha (H,W)).  H and W must be multiples of
    ``tile``.

    ``stream_cap`` selects the candidate-stream blend path
    (ops/gs_stream.py): per-tile splat lists live in ONE depth-sorted
    stream of at most ``stream_cap`` rows (chunk-aligned per tile) that
    the kernel windows by scalar-prefetch index maps — O(stream) narrow
    gathers instead of O(T * tile_cap) slot-row gathers (the 78 ms
    hotspot at 800^2/100k, docs/DESIGN.md).  ``0`` (default) picks
    4 * N rounded up; ``None`` disables streaming and uses the dense
    (T, tile_cap) slot-table path.  Tiles whose chunk lists would
    overflow the stream render empty (same spirit as the tile_cap
    truncation; size the cap generously)."""
    assert cam.height % tile == 0 and cam.width % tile == 0
    assert tile_cap % chunk == 0, "tile_cap must be a multiple of chunk"
    if use_pallas_blend is None:
        use_pallas_blend = tile == 16
    ty_n, tx_n = cam.height // tile, cam.width // tile
    n_tiles = ty_n * tx_n

    means2d, cov2d, depth, rgb, opacity = project_gaussians(
        params, viewmat, cam, scaling_modifier
    )
    if mean2d_offset is not None:
        means2d = means2d + mean2d_offset
    n = means2d.shape[0]

    # depth order WITHOUT permuting gaussian rows (TPU sort constraints, see
    # _argsort_f32): rank[g] = depth rank; the tile keys embed it so each
    # tile's slot list comes out in blend order while all per-gaussian
    # arrays stay in original index order.
    perm = _argsort_f32(depth)          # blend position -> gaussian index
    rank = _inverse_permutation(perm)   # gaussian index -> blend position

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det = jnp.maximum(det, 1e-8)
    conic = jnp.stack(
        [cov2d[:, 2] / det, -cov2d[:, 1] / det, cov2d[:, 0] / det], -1
    )
    # 3-sigma pixel radius (forward.cu:205-209: 3*sqrt(max eigenvalue))
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # tile bbox, truncated to max_tiles_side per axis around the bbox start
    tx0 = jnp.floor((means2d[:, 0] - radius) / tile).astype(jnp.int32)
    ty0 = jnp.floor((means2d[:, 1] - radius) / tile).astype(jnp.int32)
    tx1 = jnp.floor((means2d[:, 0] + radius) / tile).astype(jnp.int32)
    ty1 = jnp.floor((means2d[:, 1] + radius) / tile).astype(jnp.int32)
    tx0c, tx1c = jnp.clip(tx0, 0, tx_n - 1), jnp.clip(tx1, 0, tx_n - 1)
    ty0c, ty1c = jnp.clip(ty0, 0, ty_n - 1), jnp.clip(ty1, 0, ty_n - 1)
    on_screen = (
        (tx1 >= 0) & (tx0 <= tx_n - 1) & (ty1 >= 0) & (ty0 <= ty_n - 1)
        & (opacity > 0.0)
    )

    # fixed-fanout duplication: key = tile_id * N + depth_rank; invalid
    # slots get the sentinel key n_tiles * N.  int32 keys require
    # (n_tiles + 1) * N < 2^31 — ample for 800^2/16 tiles at 10^6 splats.
    assert (n_tiles + 1) * n < 2**31, "tile keys overflow int32"
    ks = max_tiles_side
    # candidate-major (ks^2, N) layout: N rides the lane axis at full
    # occupancy ((N, ks, ks) puts the size-ks dims on the register tile)
    di = jnp.arange(ks, dtype=jnp.int32)
    dxx = jnp.repeat(di, ks)[:, None]                     # (ks^2, 1)
    dyy = jnp.tile(di, ks)[:, None]
    gx = tx0c[None, :] + dxx                              # (ks^2, N)
    gy = ty0c[None, :] + dyy
    slot_valid = (
        (gx <= tx1c[None, :]) & (gy <= ty1c[None, :]) & on_screen[None, :]
    )
    tile_id = gy * tx_n + gx
    key = jnp.where(
        slot_valid,
        tile_id * n + rank[None, :],
        jnp.int32(n_tiles * n),
    ).reshape(-1)
    skey = jax.lax.sort(key)

    # per-tile ranges + capacity-capped slot table
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * n
    starts = jnp.searchsorted(skey, bounds[:-1], side="left")
    ends = jnp.searchsorted(skey, bounds[1:], side="left")

    feat = jnp.concatenate(
        [means2d, conic, rgb, opacity[:, None]], axis=-1
    )  # (N, 9)

    from pixie_tpu.ops.gs_stream import CH as _STREAM_CH  # noqa: PLC0415

    if (stream_cap is not None and use_pallas_blend and tile == 16
            and tile_cap % _STREAM_CH == 0
            and 1 <= tile_cap // _STREAM_CH <= 9):
        from pixie_tpu.ops.gs_stream import (  # noqa: PLC0415
            CH, ROWS_CARR, ROWS_IN, blend_stream)

        if stream_cap == 0:
            # 4N candidate rows + one chunk per tile of alignment slack
            stream_cap = (-(-4 * n // CH) + n_tiles) * CH
        assert stream_cap % CH == 0
        nc_max = tile_cap // CH
        assert 1 <= nc_max <= ROWS_CARR + 1
        n_blocks = stream_cap // CH

        raw = ends - starts
        count = jnp.minimum(raw, tile_cap)
        nch_want = (count + CH - 1) // CH
        cum = jnp.cumsum(nch_want)
        fits = cum <= n_blocks          # prefix property: cum is monotone
        nch = jnp.where(fits, nch_want, 0).astype(jnp.int32)
        count = jnp.where(fits, count, 0).astype(jnp.int32)
        ps_blocks = jnp.minimum(cum - nch_want, n_blocks).astype(jnp.int32)

        # block -> owning tile, via a tiny (T-update) scatter + cumsum;
        # per-STREAM-ROW indices then come from a block-level gather that
        # is ~CH times smaller than the row count
        ind = jnp.zeros((n_blocks + 1,), jnp.int32).at[ps_blocks].add(
            1, mode="drop")
        t_of_block = jnp.cumsum(ind[:n_blocks]) - 1
        delta = starts - ps_blocks * CH                 # (T,) row offset
        src = (
            jnp.arange(stream_cap, dtype=jnp.int32)
            + jnp.repeat(jnp.take(delta, jnp.clip(t_of_block, 0, None)), CH)
        )
        src = jnp.clip(src, 0, skey.shape[0] - 1)
        grank_pad = (jnp.take(skey, src) % n).astype(jnp.int32)

        # compose the two-level gather feat[perm][grank_pad] into ONE row
        # gather: the inner depth-reorder would cost an (N, 9) chunked take
        # forward AND a full 9-sort segment-sum VJP backward; composing
        # replaces both with a single (B,) int take of perm.
        stream9 = _tile_gather(feat, jnp.take(perm, grank_pad))  # (B, 9)
        g16s = jnp.pad(stream9, ((0, 0), (0, ROWS_IN - 9))).T
        interp = jax.default_backend() != "tpu"
        out, _carr = blend_stream(
            g16s, ps_blocks, nch, count, tx_n, n_tiles, nc_max, interp)
        color = jnp.moveaxis(out[:, :3, :], 1, -1).reshape(
            n_tiles, tile, tile, 3)
        trans = out[:, 3, :].reshape(n_tiles, tile, tile)
        color = color + bg_color * trans[..., None]
        img = color.reshape(ty_n, tx_n, tile, tile, 3).swapaxes(
            1, 2).reshape(cam.height, cam.width, 3)
        alpha_img = (1.0 - trans).reshape(
            ty_n, tx_n, tile, tile).swapaxes(1, 2).reshape(
            cam.height, cam.width)
        return img, alpha_img

    slots = starts[:, None] + jnp.arange(tile_cap)[None, :]      # (T, C)
    slot_ok = slots < ends[:, None]
    grank = (
        jnp.take(skey, jnp.clip(slots, 0, skey.shape[0] - 1)) % n
    ).astype(jnp.int32)
    # blend-order rank -> original gaussian index
    gidx = jnp.where(slot_ok, jnp.take(perm, grank), 0)

    # gather per-tile gaussian rows (custom-VJP gather: scatter-free bwd)
    g = _tile_gather(feat, gidx)                                  # (T, C, 9)
    g = jnp.where(slot_ok[..., None], g, 0.0)

    if use_pallas_blend:
        # fused per-tile blend kernel (ops/gs_blend.py): ~30x over the XLA
        # scan at 800^2/100k (everything in VMEM, triangular-matmul
        # transmittance on the MXU)
        from pixie_tpu.ops.gs_blend import ROWS_IN, ROWS_OUT, blend_tiles  # noqa: PLC0415

        g16 = jnp.moveaxis(g, -1, 1)                     # (T, 9, C)
        g16 = jnp.pad(g16, ((0, 0), (0, ROWS_IN - g16.shape[1]), (0, 0)))
        interp = jax.default_backend() != "tpu"
        # the kernel stores nc-1 transmittance carries in the output's spare
        # rows; grow the chunk so nc fits
        kchunk = chunk
        while tile_cap // kchunk - 1 > ROWS_OUT - 4:
            kchunk *= 2
        # gs_blend derives nc = tile_cap // kchunk; a non-dividing kchunk
        # would silently drop the trailing splat columns in fwd AND bwd
        if tile_cap % kchunk:
            raise ValueError(
                f"tile_cap={tile_cap} is not divisible by the carry-grown "
                f"chunk {kchunk} (from chunk={chunk}); pick tile_cap as a "
                f"multiple of a power-of-two chunk (e.g. 512/128, 1024/256)")
        out = blend_tiles(g16, tx_n, kchunk, interp)     # (T, 8, 256)
        color = jnp.moveaxis(out[:, :3, :], 1, -1).reshape(
            n_tiles, tile, tile, 3)
        trans = out[:, 3, :].reshape(n_tiles, tile, tile)
        color = color + bg_color * trans[..., None]
        img = color.reshape(ty_n, tx_n, tile, tile, 3).swapaxes(1, 2).reshape(
            cam.height, cam.width, 3)
        alpha_img = (1.0 - trans).reshape(
            ty_n, tx_n, tile, tile).swapaxes(1, 2).reshape(
            cam.height, cam.width)
        return img, alpha_img

    gm, gc, gcol, gop = g[..., 0:2], g[..., 2:5], g[..., 5:8], g[..., 8]

    # per-tile pixel coordinates
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    base_x = (t_ids % tx_n) * tile
    base_y = (t_ids // tx_n) * tile
    px = jnp.arange(tile, dtype=jnp.float32) + 0.5
    pix_x = base_x[:, None, None].astype(jnp.float32) + px[None, None, :]
    pix_y = base_y[:, None, None].astype(jnp.float32) + px[None, :, None]
    pix_x = jnp.broadcast_to(pix_x, (n_tiles, tile, tile))
    pix_y = jnp.broadcast_to(pix_y, (n_tiles, tile, tile))

    nc = tile_cap // chunk

    def blend_chunk(carry, inp):
        color_acc, trans = carry
        m, cn, col, o = inp
        dx = pix_x[..., None] - m[:, None, None, :, 0]   # (T, t, t, chunk)
        dy = pix_y[..., None] - m[:, None, None, :, 1]
        power = (-0.5 * (cn[:, None, None, :, 0] * dx * dx
                         + cn[:, None, None, :, 2] * dy * dy)
                 - cn[:, None, None, :, 1] * dx * dy)
        alpha = jnp.minimum(
            o[:, None, None, :] * jnp.exp(jnp.minimum(power, 0.0)), 0.99
        )
        alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)
        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=-1)
        # exclusive cumprod as cum/one_minus (alpha <= 0.99 keeps the
        # divisor >= 0.01): a minor-axis concat-pad here costs ~12 ms/pass
        # on TPU (lane shift of a 327 MB tensor)
        w = alpha * (cum / one_minus) * trans[..., None]
        # per-channel VPU contraction — an einsum "tijc,tce->tije" lowers
        # as batched matmul with N=3, padding the lane axis 3->128
        color_acc = color_acc + jnp.stack(
            [jnp.sum(w * col[:, None, None, :, e], axis=-1) for e in range(3)],
            axis=-1,
        )
        trans = trans * cum[..., -1]
        return (color_acc, trans), None

    init = (
        jnp.zeros((n_tiles, tile, tile, 3), jnp.float32),
        jnp.ones((n_tiles, tile, tile), jnp.float32),
    )
    xs = (
        gm.reshape(n_tiles, nc, chunk, 2).swapaxes(0, 1),
        gc.reshape(n_tiles, nc, chunk, 3).swapaxes(0, 1),
        gcol.reshape(n_tiles, nc, chunk, 3).swapaxes(0, 1),
        gop.reshape(n_tiles, nc, chunk).swapaxes(0, 1),
    )
    (color, trans), _ = jax.lax.scan(jax.checkpoint(blend_chunk), init, xs)
    color = color + bg_color * trans[..., None]

    # (TY*TX, t, t, c) -> (H, W, c)
    img = color.reshape(ty_n, tx_n, tile, tile, 3).swapaxes(1, 2).reshape(
        cam.height, cam.width, 3
    )
    alpha_img = (1.0 - trans).reshape(ty_n, tx_n, tile, tile).swapaxes(
        1, 2
    ).reshape(cam.height, cam.width)
    return img, alpha_img
