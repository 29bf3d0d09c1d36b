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
import os
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
            # lo/hi split is a pure table-layout bijection (idx =
            # hi*LO + lo; same table size, same hash, same function
            # space).  The 256/16 variant (halved (B, HI*F)
            # intermediate) measured SLOWER on TPU — 313.1 vs 250.4 ms
            # full step at the r5e A/B (docs/tpu_logs/r5e_queue.log) —
            # so the default stays at the r5b-record 128/32 layout.
            lo, hi = (int(s) for s in os.environ.get(
                "PIXIE_FEAT_LOHI", "128,32").split(","))
            enc = MXUHashEncoding(
                MXUHashConfig(n_levels=12, features_per_level=8,
                              lo=lo, hi=hi, base_resolution=16,
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


class ProposalField(nn.Module):
    """Tiny density-only field for proposal sampling (nerfstudio's
    HashMLPDensityField analog, nerfacto proposal_networks).  A small MXU
    hash encode + 1-layer MLP: ~1/10 the FLOPs of the full NerfField, so
    spending 64 coarse samples here and only n_fine samples in the full
    fields is the TPU-efficient shape of hierarchical sampling."""

    @nn.compact
    def __call__(self, positions):
        enc = MXUHashEncoding(
            MXUHashConfig(n_levels=5, features_per_level=2,
                          lo=128, hi=16, base_resolution=16,
                          max_resolution=128),
            name="grid",
        )(positions)
        h = MLP(16, 1, 1, name="density_mlp")(enc)
        return jnp.exp(jnp.clip(h - 1.0, -15.0, 15.0))


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
    # left-bisect as dense compare-count (see _searchsorted_right)
    idx = jnp.clip(
        jnp.sum(cdf[..., None, :] < u2[..., :, None], axis=-1)
        .astype(jnp.int32), 0, cfg.n_coarse - 1
    )
    t_f = (_gather_last(t_c, idx) if _pdf_dense()
           else jnp.take_along_axis(t_c, idx, axis=-1))

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


# ---------------------------------------------------------------------------
# Proposal-sampled rendering (the nerfacto proposal-network machinery,
# nerfstudio model_components/ray_samplers.py ProposalNetworkSampler +
# mip-NeRF 360 interlevel loss) — TPU-first: fixed sample counts, one jit.
# ---------------------------------------------------------------------------


def _weights_from_sigma(sigma, t_edges):
    """Piecewise-constant volume-rendering weights per interval."""
    delta = t_edges[..., 1:] - t_edges[..., :-1]
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1
    )
    return alpha * trans


def _searchsorted_right(sorted_ref, queries):
    """Batched right-bisect via compare-and-count.

    TPU-first replacement for vmapped ``jnp.searchsorted``: the bin counts
    here are tiny (n_coarse+1 <= 65), so a dense (rays, Q, B) compare +
    sum-reduce is pure VPU work, where searchsorted lowers to a serial
    while-loop per ray (this runtime executes dynamic indexing at
    ~14 ns/element, docs/DESIGN.md).  Identical results: count of
    ref <= q == right-bisection index."""
    return jnp.sum(
        (sorted_ref[..., None, :] <= queries[..., :, None]),
        axis=-1).astype(jnp.int32)


def _gather_last(ref, idx):
    """Gather ``ref[..., idx]`` along a tiny last axis without a gather.

    ``take_along_axis`` lowers to a serial per-element gather on this TPU
    (~14 ns/elem, docs/DESIGN.md) and its transpose is a scatter-add; with
    the bin axis tiny (<= 65) a dense one-hot compare + multiply-reduce is
    pure fused VPU work in both directions.  Bit-identical to the gather
    (the one-hot select returns the exact stored row value)."""
    b = ref.shape[-1]
    onehot = (idx[..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, idx.shape + (b,),
                                       idx.ndim)).astype(ref.dtype)
    return jnp.sum(onehot * ref[..., None, :], axis=-1)


def _pdf_dense() -> bool:
    """PIXIE_PDF_DENSE: gather-free inverse-CDF interpolation (r5g lever).

    Default ON: measured 240.6 ms vs 249.9 ms field step @4096 rays on
    v5e (docs/tpu_logs/r5g_queue.log) — the one-hot contraction replaces
    6 take_along_axis sites whose fwd gathers + bwd scatter-adds are
    serial on this TPU.  PIXIE_PDF_STRAT (dropping the jnp.sort via
    stratified u) measured NEGATIVE on top of it (250.1 ms) and
    pathological alone (>38 min compile) — dead end, see DESIGN.md."""
    return os.environ.get("PIXIE_PDF_DENSE", "1") == "1"


def _sample_pdf(t_edges, weights, n: int, rng, train: bool):
    """Continuous inverse-CDF sampling of n points from the piecewise-
    constant pdf over intervals (NeRF sample_pdf; linear interp in-bin).

    PIXIE_PDF_STRAT=1 draws stratified u (one uniform per 1/n slot — the
    nerfstudio PDF-sampler default, ray_samplers.py stratified u) which is
    sorted by construction, so the monotone CDF inverse needs no final
    sort (the sort's backward pass is a serial gather-by-permutation on
    this TPU)."""
    n_rays, n_bins = weights.shape
    w = weights + 1e-5
    cdf = jnp.cumsum(w, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
    cdf = cdf / cdf[..., -1:]

    stratified = os.environ.get("PIXIE_PDF_STRAT", "0") == "1"
    if train and stratified:
        u = (jnp.arange(n, dtype=jnp.float32)[None]
             + jax.random.uniform(rng, (n_rays, n))) / n
    elif train:
        u = jax.random.uniform(rng, (n_rays, n))
    else:
        u = jnp.broadcast_to(
            jnp.linspace(1e-4, 1.0 - 1e-4, n), (n_rays, n)
        )
    idx = jnp.clip(_searchsorted_right(cdf, u) - 1, 0, n_bins - 1)
    if _pdf_dense():
        cdf_lo = _gather_last(cdf, idx)
        cdf_hi = _gather_last(cdf, idx + 1)
        t_lo = _gather_last(t_edges, idx)
        t_hi = _gather_last(t_edges, idx + 1)
    else:
        cdf_lo = jnp.take_along_axis(cdf, idx, axis=-1)
        cdf_hi = jnp.take_along_axis(cdf, idx + 1, axis=-1)
        t_lo = jnp.take_along_axis(t_edges, idx, axis=-1)
        t_hi = jnp.take_along_axis(t_edges, idx + 1, axis=-1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-8, 1.0, cdf_hi - cdf_lo)
    frac = (u - cdf_lo) / denom
    t = t_lo + frac * (t_hi - t_lo)
    if (train and stratified) or not train:
        return t  # sorted by construction: monotone inverse of sorted u
    return jnp.sort(t, axis=-1)


def _outer_measure(t_ref, w_ref, t_query):
    """Sum of reference mass over bins intersecting each query interval
    (mip-NeRF 360 inner_outer upper bound; multinerf stepfun.py)."""
    cw = jnp.cumsum(w_ref, axis=-1)
    cw = jnp.concatenate([jnp.zeros_like(cw[..., :1]), cw], -1)
    n_bins = w_ref.shape[-1]
    # left-bisect = count of ref < q; right-bisect = count of ref <= q
    # (dense compare-count, see _searchsorted_right)
    idx_lo = jnp.clip(
        _searchsorted_right(t_ref, t_query[..., :-1]) - 1, 0, n_bins)
    idx_hi = jnp.clip(
        jnp.sum(t_ref[..., None, :] < t_query[..., 1:, None],
                axis=-1).astype(jnp.int32), 0, n_bins)
    if _pdf_dense():
        return (_gather_last(cw, idx_hi)
                - _gather_last(cw, jnp.minimum(idx_lo, idx_hi)))
    return (jnp.take_along_axis(cw, idx_hi, axis=-1)
            - jnp.take_along_axis(cw, jnp.minimum(idx_lo, idx_hi), axis=-1))


def proposal_loss(t_prop, w_prop, t_fine, w_fine, eps: float = 1e-7):
    """Interlevel loss: penalize proposal mass under-covering the final
    distribution (mip-NeRF 360 eq. 13; gradient flows to the proposal)."""
    w = jax.lax.stop_gradient(w_fine)
    bound = _outer_measure(t_prop, w_prop, t_fine)
    return jnp.mean(jnp.maximum(0.0, w - bound) ** 2 / (w + eps))


def render_rays_prop(
    prop_apply, nerf_apply, feat_apply, params_prop, params_nerf, params_feat,
    origins, directions, rng, cfg: RenderConfig, train: bool = True,
    with_features: bool = True,
):
    """Proposal-sampled hierarchical rendering.

    n_coarse stratified samples through the tiny ProposalField pick
    n_fine samples for the full fields; returns the render plus
    "prop_loss" (add to the training objective at weight ~1.0, the
    nerfacto interlevel_loss_mult default).
    """
    n_rays = origins.shape[0]

    edges = jnp.linspace(cfg.near, cfg.far, cfg.n_coarse + 1)
    t_edges = jnp.broadcast_to(edges, (n_rays, cfg.n_coarse + 1))
    if train:
        mids = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
        jitter = (jax.random.uniform(rng, mids.shape) - 0.5) \
            * (t_edges[..., 1:] - t_edges[..., :-1])
        t_p = mids + jitter
    else:
        t_p = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])

    pts_p = origins[:, None, :] + t_p[..., None] * directions[:, None, :]
    sigma_p = prop_apply(params_prop, pts_p * 0.5 + 0.5)[..., 0]
    w_p = _weights_from_sigma(sigma_p, t_edges)

    t_f = _sample_pdf(
        t_edges, w_p, cfg.n_fine, jax.random.fold_in(rng, 1), train
    )
    # PIXIE_DETACH_SAMPLES=1 stops gradients at the fine sample
    # positions (mip-NeRF 360 / nerfacto semantics: proposal trains only
    # through the interlevel loss).  Counter-intuitively it measured
    # SLOWER on TPU (+47 ms: 306.8 all-on vs 259.9 no-detach, r5e A/B,
    # docs/tpu_logs/r5e_queue.log — the stop_gradient breaks an XLA
    # bwd fusion), so the default keeps the r5b end-to-end-differentiated
    # semantics; the gate remains for the nerfacto-parity choice.
    if os.environ.get("PIXIE_DETACH_SAMPLES", "0") == "1":
        t_f = jax.lax.stop_gradient(t_f)
    # final intervals: midpoints between samples, closed by near/far
    t_f_edges = jnp.concatenate(
        [
            jnp.full_like(t_f[..., :1], cfg.near),
            0.5 * (t_f[..., 1:] + t_f[..., :-1]),
            jnp.full_like(t_f[..., :1], cfg.far),
        ],
        axis=-1,
    )

    pts = origins[:, None, :] + t_f[..., None] * directions[:, None, :]
    pts01 = pts * 0.5 + 0.5
    dirs = jnp.broadcast_to(directions[:, None, :], pts.shape)
    sigma, rgb = nerf_apply(params_nerf, pts01, dirs, False)
    sigma = sigma[..., 0]
    w = _weights_from_sigma(sigma, t_f_edges)

    acc = w.sum(-1)
    rgb_out = (w[..., None] * rgb).sum(-2) + cfg.bg_color * (1.0 - acc[..., None])
    depth = (w * t_f).sum(-1)

    out = {
        "rgb": rgb_out, "accumulation": acc, "depth": depth, "weights": w,
        "prop_loss": proposal_loss(t_edges, w_p, t_f_edges, w),
    }
    if with_features and feat_apply is not None:
        feats = feat_apply(params_feat, pts01)
        wf = jax.lax.stop_gradient(w)
        out["feature"] = (wf[..., None] * feats).sum(-2)
    return out
