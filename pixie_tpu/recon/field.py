"""Radiance + distilled-feature fields (the f3rm/Nerfacto replacement).

Reference: third_party/f3rm/f3rm/feature_field.py:20-120 (FeatureField:
hashgrid 12 levels x 8 features, 2^19 table, res 16->128, + frequency PE,
MLP 64x2 -> 768-d CLIP feature) and nerfstudio's Nerfacto RGB field
(hashgrid + density MLP + SH-direction color head), trained jointly with a
feature MSE at weight 1e-3 (f3rm/model.py:264-269).

This is a TPU-first re-design, not a port: no proposal networks — a uniform
+ one importance-resampling pass inside a single jitted render step (objects
fit in a unit box; scene contraction disabled as the pipeline does for
Objaverse assets, f3rm_config.py / pipeline.py:84-133).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixie_tpu.recon.hashgrid import (
    HashGridConfig,
    HashGridEncoding,
    frequency_encoding,
    sh_encoding,
)
from pixie_tpu.recon.mxu_hash import MXUHashConfig, MXUHashEncoding


class MLP(nn.Module):
    hidden: int
    depth: int
    out: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = nn.Dense(self.hidden, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="out")(x)


class NerfField(nn.Module):
    """Density + RGB field (Nerfacto-lite).

    encoding="mxu" (default) uses the gather-free MXU hash encoding
    (recon/mxu_hash.py — the TPU-native fast path); "hashgrid" keeps the
    tcnn-layout gather encoding (slow on TPU, exact tcnn semantics).
    """

    geo_dim: int = 15
    encoding: str = "mxu"

    @nn.compact
    def __call__(self, positions, directions=None, density_only: bool = False):
        if self.encoding == "mxu":
            enc = MXUHashEncoding(
                MXUHashConfig(n_levels=16, features_per_level=2,
                              lo=128, hi=64, base_resolution=16,
                              max_resolution=512),
                name="grid",
            )(positions)
        else:
            enc = HashGridEncoding(
                HashGridConfig(n_levels=16, features_per_level=2,
                               log2_table_size=19, base_resolution=16,
                               max_resolution=1024),
                name="grid",
            )(positions)
        h = MLP(64, 1, 1 + self.geo_dim, name="density_mlp")(enc)
        # trunc_exp-style density activation (nerfstudio)
        density = jnp.exp(jnp.clip(h[..., :1] - 1.0, -15.0, 15.0))
        if density_only:
            return density
        geo = h[..., 1:]
        if directions is None:
            directions = jnp.zeros_like(positions)
        d_enc = sh_encoding(directions, degree=4)
        rgb = MLP(64, 2, 3, name="color_mlp")(
            jnp.concatenate([geo, d_enc], axis=-1)
        )
        return density, jax.nn.sigmoid(rgb)


class FeatureField(nn.Module):
    """Distilled CLIP feature field (f3rm/feature_field.py:20-120)."""

    feature_dim: int = 768
    use_pe: bool = True
    pe_n_freq: int = 6
    encoding: str = "mxu"

    @nn.compact
    def __call__(self, positions):
        if self.encoding == "mxu":
            enc = MXUHashEncoding(
                MXUHashConfig(n_levels=12, features_per_level=8,
                              lo=128, hi=32, base_resolution=16,
                              max_resolution=128),
                name="grid",
            )(positions)
        else:
            enc = HashGridEncoding(
                HashGridConfig(n_levels=12, features_per_level=8,
                               log2_table_size=19, base_resolution=16,
                               max_resolution=128),
                name="grid",
            )(positions)
        if self.use_pe:
            enc = jnp.concatenate(
                [enc, frequency_encoding(positions, self.pe_n_freq)], axis=-1
            )
        return MLP(64, 2, self.feature_dim, name="mlp")(enc)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    n_coarse: int = 64
    n_fine: int = 64
    near: float = 0.05
    far: float = 3.0
    bg_color: float = 0.0  # BlenderNeRF data has black background


def render_rays(
    nerf_apply, feat_apply, params_nerf, params_feat, origins, directions,
    rng, cfg: RenderConfig, train: bool = True, with_features: bool = True,
):
    """Hierarchical volume rendering of rgb / features / depth / accumulation.

    One jitted function: coarse uniform sampling, PDF importance resampling,
    single evaluation on the union (compiler-friendly: fixed sample counts).
    """
    n_rays = origins.shape[0]

    t_coarse = jnp.linspace(cfg.near, cfg.far, cfg.n_coarse + 1)
    lower, upper = t_coarse[:-1], t_coarse[1:]
    if train:
        u = jax.random.uniform(rng, (n_rays, cfg.n_coarse))
    else:
        u = jnp.full((n_rays, cfg.n_coarse), 0.5)
    t_c = lower[None] + (upper - lower)[None] * u

    pts_c = origins[:, None, :] + t_c[..., None] * directions[:, None, :]
    sigma_c = nerf_apply(params_nerf, pts_c * 0.5 + 0.5, None, True)[..., 0]

    # importance weights from the coarse pass
    delta_c = jnp.diff(t_c, axis=-1, append=t_c[..., -1:] + (cfg.far - cfg.near) / cfg.n_coarse)
    alpha_c = 1.0 - jnp.exp(-sigma_c * delta_c)
    trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
    trans_c = jnp.concatenate([jnp.ones_like(trans_c[..., :1]), trans_c[..., :-1]], -1)
    w_c = alpha_c * trans_c

    # PDF resampling (inverse CDF, fixed n_fine)
    cdf = jnp.cumsum(w_c + 1e-5, axis=-1)
    cdf = cdf / cdf[..., -1:]
    if train:
        u2 = jax.random.uniform(jax.random.fold_in(rng, 1), (n_rays, cfg.n_fine))
    else:
        u2 = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0 - 1e-4, cfg.n_fine), (n_rays, cfg.n_fine)
        )
    idx = jnp.clip(
        jnp.searchsorted(cdf[0], u2[0])[None, :] * 0 +
        jax.vmap(jnp.searchsorted)(cdf, u2), 0, cfg.n_coarse - 1
    )
    t_f = jnp.take_along_axis(t_c, idx, axis=-1)

    t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)
    pts = origins[:, None, :] + t_all[..., None] * directions[:, None, :]
    pts01 = pts * 0.5 + 0.5

    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    sigma, rgb = nerf_apply(params_nerf, pts01, dirs, False)
    sigma = sigma[..., 0]

    delta = jnp.diff(t_all, axis=-1, append=t_all[..., -1:] + 1e10)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    w = alpha * trans

    acc = w.sum(-1)
    rgb_out = (w[..., None] * rgb).sum(-2) + cfg.bg_color * (1.0 - acc[..., None])
    depth = (w * t_all).sum(-1)

    out = {"rgb": rgb_out, "accumulation": acc, "depth": depth, "weights": w}
    if with_features and feat_apply is not None:
        feats = feat_apply(params_feat, pts01)
        # stop-gradient on weights: feature loss must not shape geometry
        # (f3rm/model.py renders features with detached weights)
        wf = jax.lax.stop_gradient(w)
        out["feature"] = (wf[..., None] * feats).sum(-2)
    return out
