"""Differentiable Gaussian-splat rasterizer (diff-gaussian-rasterization port).

Reference: cuda_rasterizer/forward.cu (preprocessCUDA:156 — EWA projection of
3D covariance to 2D, SH->RGB; renderCUDA:262 — per-tile front-to-back alpha
blending of depth-sorted gaussians) and backward.cu.  The CUDA version
duplicates keys per (tile, depth) and radix-sorts; per-pixel threads then
walk their tile's range.

TPU-first redesign: one global depth sort, then a ``lax.scan`` over fixed
gaussian chunks; each chunk blends against the whole image with an exclusive
within-chunk transmittance cumprod — front-to-back order is preserved
globally by the sort and within the chunk by the cumprod, so the compositing
is exactly the reference's, but fully dense and reverse-mode differentiable
(the scan body is rematerialized to bound memory).  Tile culling is a later
optimization; correctness and differentiability first.
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
