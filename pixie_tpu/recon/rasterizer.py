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


def project_gaussians(params, viewmat, cam: Camera, scaling_modifier=1.0):
    """World gaussians -> screen: means2D, 2D covariance, depth, rgb, opacity.

    EWA splatting as in preprocessCUDA (forward.cu:74-155): cov2D =
    J W Sigma W^T J^T with a +0.3 pixel blur on the diagonal.
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

    cov3d = G.get_covariance(params, scaling_modifier)
    cov_cam = jnp.einsum("ij,njk,lk->nil", r, cov3d, r)
    # Jacobian of perspective projection (forward.cu:91-103)
    j00 = cam.fx / z
    j02 = -cam.fx * x / (z * z)
    j11 = cam.fy / z
    j12 = -cam.fy * y / (z * z)
    a, b, c = cov_cam[:, 0, 0], cov_cam[:, 0, 1], cov_cam[:, 0, 2]
    d, e = cov_cam[:, 1, 1], cov_cam[:, 1, 2]
    f = cov_cam[:, 2, 2]
    c00 = j00 * (j00 * a + j02 * c) + j02 * (j00 * c + j02 * f)
    c01 = j00 * (j11 * b + j12 * c) + j02 * (j11 * e + j12 * f)
    c11 = j11 * (j11 * d + j12 * e) + j12 * (j11 * e + j12 * f)
    c00 = c00 + 0.3
    c11 = c11 + 0.3

    # view-dir SH color (forward.cu computeColorFromSH)
    cam_pos = -r.T @ t
    dirs = xyz - cam_pos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    shs = G.get_shs(params)
    degree = {1: 0, 4: 1, 9: 2, 16: 3}.get(shs.shape[1], 3)
    rgb = jnp.clip(G.eval_sh(shs, dirs, degree), 0.0, None)

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
    order = jnp.argsort(depth)
    means2d = jnp.pad(means2d[order], ((0, pad), (0, 0)))
    cov2d = jnp.pad(cov2d[order], ((0, pad), (0, 0)), constant_values=1.0)
    rgb = jnp.pad(rgb[order], ((0, pad), (0, 0)))
    opacity = jnp.pad(opacity[order], ((0, pad),))

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
        # exclusive within-chunk transmittance
        cum = jnp.cumprod(one_minus, axis=-1)
        cum_excl = jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1
        )
        w = alpha * cum_excl * trans[..., None]
        color_acc = color_acc + jnp.einsum("hwc,ce->hwe", w, col)
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

def _sort_columns(key, cols):
    """Variadic lax.sort: reorder each (N,) column by ascending ``key``.
    Returns (sorted_key_payloads...).  Used instead of argsort + row gather:
    XLA:TPU rewrites that pattern (when the operand is a concat of computed
    columns) into a dense one-hot contraction — an (N, N+F) 40 GB
    allocation at 100k splats — while the explicit variadic sort lowers
    cleanly."""
    return jax.lax.sort((key, *cols), num_keys=1)


@jax.custom_vjp
def _depth_permute(depth, data):
    """data (N, F) sorted by ascending depth -> (sorted_data, order).

    order[i] = original index of sorted row i.  Custom VJP: a permutation's
    exact cotangent is the inverse permutation, expressed as another
    variadic sort keyed on ``order`` (sorting by the permutation IS its
    inverse application)."""
    return _depth_permute_fwd(depth, data)[0]


def _depth_permute_fwd(depth, data):
    n, f = data.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    out = _sort_columns(depth, [iota] + [data[:, i] for i in range(f)])
    order = out[1]
    sorted_data = jnp.stack(out[2:], axis=1)
    return (sorted_data, order), order


def _depth_permute_bwd(order, cts):
    ct_data, _ct_order = cts
    f = ct_data.shape[1]
    inv = _sort_columns(order, [ct_data[:, i] for i in range(f)])
    grad_data = jnp.stack(inv[1:], axis=1)
    return jnp.zeros_like(order, jnp.float32), grad_data


_depth_permute.defvjp(_depth_permute_fwd, _depth_permute_bwd)


@jax.custom_vjp
def _tile_gather(data, gidx):
    """data (N, F) gathered at gidx (T, C) -> (T, C, F).

    Forward is a plain row gather (fast on TPU).  The backward avoids XLA's
    serial scatter-add: flatten the cotangents, sort them by gaussian index,
    cumsum, and difference at segment boundaries found with searchsorted."""
    return data[gidx]


def _tile_gather_fwd(data, gidx):
    return data[gidx], (gidx, data.shape[0])


def _tile_gather_bwd(res, ct):
    gidx, n = res
    t, c = gidx.shape
    f = ct.shape[-1]
    flat_idx = gidx.reshape(-1)
    flat_ct = ct.reshape(-1, f)
    # variadic sort instead of argsort + row gather (see _sort_columns)
    out = _sort_columns(flat_idx, [flat_ct[:, i] for i in range(f)])
    sidx = out[0]
    sct = jnp.stack(out[1:], axis=1)
    csum = jnp.cumsum(sct.astype(jnp.float32), axis=0)
    csum = jnp.concatenate([jnp.zeros((1, f), jnp.float32), csum], axis=0)
    # segment [lo_i, hi_i) of rows belonging to gaussian i
    lo = jnp.searchsorted(sidx, jnp.arange(n), side="left")
    hi = jnp.searchsorted(sidx, jnp.arange(n), side="right")
    grad = (csum[hi] - csum[lo]).astype(ct.dtype)
    return grad, None


_tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "tile", "tile_cap", "max_tiles_side", "chunk"),
)
def rasterize_tiled(params, viewmat, cam: Camera, bg_color=1.0,
                    scaling_modifier=1.0, tile: int = 16, tile_cap: int = 512,
                    max_tiles_side: int = 6, chunk: int = 128,
                    mean2d_offset=None):
    """Tile-culled differentiable rasterization (the reference's tile
    pipeline, rasterizer_impl.cu:70-116, as dense XLA).

    Returns (image (H,W,3), alpha (H,W)).  H and W must be multiples of
    ``tile``.
    """
    assert cam.height % tile == 0 and cam.width % tile == 0
    assert tile_cap % chunk == 0, "tile_cap must be a multiple of chunk"
    ty_n, tx_n = cam.height // tile, cam.width // tile
    n_tiles = ty_n * tx_n

    means2d, cov2d, depth, rgb, opacity = project_gaussians(
        params, viewmat, cam, scaling_modifier
    )
    if mean2d_offset is not None:
        means2d = means2d + mean2d_offset
    n = means2d.shape[0]

    # depth order once; from here on index order == blend order
    packed, _order = _depth_permute(
        depth,
        jnp.concatenate([means2d, cov2d, rgb, opacity[:, None]], axis=-1),
    )
    means2d, cov2d, rgb, opacity = (
        packed[:, 0:2], packed[:, 2:5], packed[:, 5:8], packed[:, 8]
    )

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
    di = jnp.arange(ks, dtype=jnp.int32)
    gx = tx0c[:, None, None] + di[None, :, None]          # (N, ks, 1)
    gy = ty0c[:, None, None] + di[None, None, :]          # (N, 1, ks) -> bc
    gx = jnp.broadcast_to(gx, (n, ks, ks))
    gy = jnp.broadcast_to(gy, (n, ks, ks))
    slot_valid = (
        (gx <= tx1c[:, None, None]) & (gy <= ty1c[:, None, None])
        & on_screen[:, None, None]
    )
    tile_id = gy * tx_n + gx
    rank = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    key = jnp.where(
        slot_valid,
        tile_id * n + rank,
        jnp.int32(n_tiles * n),
    ).reshape(-1)
    skey = jax.lax.sort(key)

    # per-tile ranges + capacity-capped slot table
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * n
    starts = jnp.searchsorted(skey, bounds[:-1], side="left")
    ends = jnp.searchsorted(skey, bounds[1:], side="left")
    slots = starts[:, None] + jnp.arange(tile_cap)[None, :]      # (T, C)
    slot_ok = slots < ends[:, None]
    gidx = (
        jnp.take(skey, jnp.clip(slots, 0, skey.shape[0] - 1)) % n
    ).astype(jnp.int32)
    gidx = jnp.where(slot_ok, gidx, 0)

    # gather per-tile gaussian rows (custom-VJP gather: scatter-free bwd)
    feat = jnp.concatenate(
        [means2d, conic, rgb, opacity[:, None]], axis=-1
    )  # (N, 9)
    g = _tile_gather(feat, gidx)                                  # (T, C, 9)
    g = jnp.where(slot_ok[..., None], g, 0.0)
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
        cum_excl = jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1
        )
        w = alpha * cum_excl * trans[..., None]
        color_acc = color_acc + jnp.einsum("tijc,tce->tije", w, col)
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
