"""3D Gaussian Splatting training (the Inria train.py loop rebuilt).

Reference: gaussian-splatting/train.py:31-160: per-iteration random camera,
render, L1 + 0.2 * (1 - SSIM) loss, Adam with per-group learning rates,
densify-and-prune every 100 iters between 500 and 15000 (split high-grad
large gaussians / clone high-grad small ones, prune low-opacity), opacity
reset every 3000 iterations.

TPU notes: the jitted train step runs at a fixed gaussian capacity;
densification/pruning happen host-side between steps and re-pad to the next
power-of-two capacity (bounded number of recompiles).  Screen-space gradient
accumulation uses the rasterizer's mean2d_offset hook instead of
retain_grad.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixie_tpu.recon import gaussians as G
from pixie_tpu.recon.rasterizer import Camera, rasterize, rasterize_tiled
from pixie_tpu.recon.train_field import load_dataset


@dataclasses.dataclass
class GSTrainConfig:
    iterations: int = 10000
    lr_xyz: float = 1.6e-4
    lr_feature: float = 2.5e-3
    lr_opacity: float = 0.05
    lr_scaling: float = 5e-3
    lr_rotation: float = 1e-3
    lambda_dssim: float = 0.2
    densify_from: int = 500
    densify_until: int = 15000
    densify_interval: int = 100
    densify_grad_threshold: float = 2e-4
    opacity_reset_interval: int = 3000
    prune_opacity: float = 0.005
    percent_dense: float = 0.01
    sh_degree: int = 3
    white_background: bool = False
    seed: int = 0
    # tile-culled rasterization: "auto" switches to the tiled path when the
    # dense O(N*H*W) blend would exceed ~2^31 gaussian-pixel pairs
    tiled: str = "auto"   # "auto" | "on" | "off"
    tile_cap: int = 1024
    max_tiles_side: int = 6


@functools.lru_cache(maxsize=8)
def _gauss_band(n: int, window: int, sigma: float):
    """(n, n) banded Gaussian-blur matrix == 'SAME' zero-padded 1-D conv.

    The 2D Gaussian window is an outer product, so the depthwise conv
    factors exactly into Y = A_h @ X @ A_w^T.  XLA lowers the [3,1,H,W]
    depthwise conv through a windowed path that costs ~20 ms/call at 800^2
    on v5e (161 ms/step across fwd+bwd — the single largest cost of 3DGS
    training, docs/DESIGN.md); as banded matmuls the whole SSIM runs on
    the MXU in ~1 ms.  Built in numpy at trace time: a traced gather from
    the 11-tap table would serialize (~17 ns/elem).  Returns NUMPY (not
    jnp): the lru_cache is shared across jit traces, and a jnp constant
    materialized inside one trace is a tracer that leaks into the next
    (per-step `step` trace -> scan-chunk `run_chunk` trace)."""
    half = window // 2
    x = np.arange(window, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    d = np.arange(n)[None, :] - np.arange(n)[:, None] + half
    a = np.where((d >= 0) & (d < window), g[np.clip(d, 0, window - 1)], 0.0)
    return a.astype(np.float32)


def ssim(img1, img2, window: int = 11, sigma: float = 1.5):
    """Gaussian-windowed SSIM (utils/loss_utils.py ssim); the separable
    window is applied as two banded MXU matmuls (see _gauss_band)."""
    h, w = img1.shape[0], img1.shape[1]
    ah = _gauss_band(h, window, sigma)
    aw = _gauss_band(w, window, sigma)
    # channels-first so W rides the lane axis in both contractions
    img1 = jnp.moveaxis(img1, -1, 0)
    img2 = jnp.moveaxis(img2, -1, 0)

    def filt(x):
        # (C, H, W): blur rows then columns on the MXU; A is symmetric.
        # HIGHEST precision: default bf16 dots visibly shift the SSIM loss
        # (0.5607 -> 0.5584 at 800^2 init); fp32 passes cost only a few ms.
        t = jnp.einsum("ij,cjw->ciw", ah, x,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("ciw,wk->cik", t, aw,
                          precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    return jnp.mean(
        ((2 * mu12 + c1) * (2 * s12 + c2))
        / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    )


def blender_viewmat(c2w: np.ndarray) -> np.ndarray:
    """Blender/NeRF c2w (look down -z, y up) -> COLMAP-style w2c with camera
    looking down +z (as the rasterizer expects)."""
    c2w = np.asarray(c2w, np.float32).copy()
    c2w[:3, 1] *= -1  # y down
    c2w[:3, 2] *= -1  # z forward
    return np.linalg.inv(c2w).astype(np.float32)


def pad_params(params, capacity: int):
    n = params["xyz"].shape[0]
    pad = capacity - n
    if pad <= 0:
        return params
    out = {}
    for k, v in params.items():
        pad_block = np.zeros((pad, *np.asarray(v).shape[1:]), np.float32)
        if k == "opacity":
            pad_block = pad_block - 20.0  # sigmoid ~ 0: invisible padding
        if k == "scaling":
            pad_block = pad_block - 20.0  # exp ~ 0: degenerate size
        if k == "rotation":
            pad_block[:, 0] = 1.0
        out[k] = jnp.concatenate([jnp.asarray(v), jnp.asarray(pad_block)], axis=0)
    return out


def make_optimizer(cfg: GSTrainConfig, spatial_scale: float):
    lrs = {
        "xyz": cfg.lr_xyz * spatial_scale,
        "f_dc": cfg.lr_feature,
        "f_rest": cfg.lr_feature / 20.0,
        "opacity": cfg.lr_opacity,
        "scaling": cfg.lr_scaling,
        "rotation": cfg.lr_rotation,
    }
    return optax.multi_transform(
        {k: optax.adam(lr, eps=1e-15) for k, lr in lrs.items()},
        {k: k for k in lrs},
    )


def densify_and_prune(params, grad_accum, denom, cfg: GSTrainConfig,
                      active_n: int, spatial_scale: float, rng):
    """Host-side split/clone/prune (gaussian_model.py densify_and_prune)."""
    p = {k: np.asarray(v)[:active_n] for k, v in params.items()}
    grads = np.asarray(grad_accum)[:active_n] / np.maximum(
        np.asarray(denom)[:active_n], 1
    )
    scales = np.exp(p["scaling"]).max(axis=1)
    high_grad = grads >= cfg.densify_grad_threshold
    big = scales > cfg.percent_dense * spatial_scale

    clone_mask = high_grad & ~big
    split_mask = high_grad & big
    keep_opacity = 1.0 / (1.0 + np.exp(-p["opacity"][:, 0])) > cfg.prune_opacity

    new_parts = []
    # clones: copy as-is
    if clone_mask.any():
        new_parts.append({k: v[clone_mask] for k, v in p.items()})
    # splits: two children sampled inside the parent, scale / 1.6
    if split_mask.any():
        parent = {k: v[split_mask] for k, v in p.items()}
        for _ in range(2):
            noise = rng.normal(size=parent["xyz"].shape).astype(np.float32)
            child = {k: v.copy() for k, v in parent.items()}
            child["xyz"] = parent["xyz"] + noise * np.exp(parent["scaling"])
            child["scaling"] = parent["scaling"] - np.log(1.6)
            new_parts.append(child)
    keep = keep_opacity & ~split_mask  # split parents removed

    merged = {k: v[keep] for k, v in p.items()}
    for part in new_parts:
        merged = {k: np.concatenate([merged[k], part[k]]) for k in merged}
    return merged


def train_gaussian_splatting(
    data_dir: str | Path,
    output_dir: str | Path,
    iterations: int = 10000,
    cfg: GSTrainConfig | None = None,
    init_points: np.ndarray | None = None,
    log_every: int = 1000,
    image_downscale: int = 1,
):
    cfg = cfg or GSTrainConfig(iterations=iterations)
    rng = np.random.default_rng(cfg.seed)
    output_dir = Path(output_dir)

    dataset = load_dataset(data_dir)
    if init_points is None and "points3d" in dataset:
        # COLMAP capture: seed from the sparse reconstruction (the
        # reference's fetchPly/BasicPointCloud path, scene/__init__.py)
        init_points = np.asarray(dataset["points3d"], np.float32)
    images = dataset["images"]
    if image_downscale > 1:
        images = images[:, ::image_downscale, ::image_downscale]
    h, w = images.shape[1:3]
    fx, fy, cx, cy = (v / image_downscale for v in dataset["intrinsics"])
    cam = Camera(h, w, fx, fy, cx, cy)
    viewmats = np.stack([blender_viewmat(c) for c in dataset["c2w"]])
    bg = 1.0 if cfg.white_background else 0.0

    if init_points is None:
        init_points = rng.uniform(-0.5, 0.5, (5000, 3)).astype(np.float32)
    params_np = create_params = G.create_from_points(
        init_points, sh_degree=cfg.sh_degree
    )
    spatial_scale = float(
        np.linalg.norm(viewmats[:, :3, 3], axis=1).max()
    ) or 1.0

    def fresh_opt(params):
        tx = make_optimizer(cfg, spatial_scale)
        return tx, tx.init(params)

    capacity = int(2 ** np.ceil(np.log2(init_points.shape[0] + 1)))
    params = pad_params(params_np, capacity)
    active_n = init_points.shape[0]
    tx, opt_state = fresh_opt(params)

    if cfg.tiled == "on":
        use_tiled = True
    elif cfg.tiled == "off":
        use_tiled = False
    else:
        use_tiled = (capacity * cam.height * cam.width > 2**31
                     and cam.height % 16 == 0 and cam.width % 16 == 0)

    def render(params, viewmat, offset):
        if use_tiled:
            return rasterize_tiled(params, viewmat, cam, bg_color=bg,
                                   tile_cap=cfg.tile_cap,
                                   max_tiles_side=cfg.max_tiles_side,
                                   mean2d_offset=offset)
        return rasterize(params, viewmat, cam, bg_color=bg,
                         mean2d_offset=offset)

    @jax.jit
    def step(params, opt_state, viewmat, gt):
        offset = jnp.zeros((params["xyz"].shape[0], 2))

        def loss_fn(params, offset):
            img, _ = render(params, viewmat, offset)
            l1 = jnp.abs(img - gt).mean()
            loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (
                1.0 - ssim(img, gt)
            )
            return loss, l1

        (loss, l1), (grads, ograds) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        screen_grad = jnp.linalg.norm(ograds, axis=-1)
        return params, opt_state, loss, l1, screen_grad

    # Scan-chunked loop (PIXIE_GS_SCAN=K, r5g lever): the per-step loop
    # below blocks on a (capacity,) screen-grad stats fetch EVERY iteration
    # (~0.5 MB device->host over the tunnel) and re-uploads the view image;
    # measured ~60 ms/iter of overhead at 10k iters (104.3 ms median device
    # step vs ~168 ms/iter wall, docs/tpu_logs/r5f_queue.log).  The chunked
    # path keeps views device-resident, rides the densify stats in the scan
    # carry, covers the stretch to the next densify/opacity-reset/log
    # boundary in ONE dispatch, and fetches stats once per densify event.
    # View-index sequence and accumulation math are identical to the
    # per-step loop (parity: tests/test_gaussians.py scan-chunk test).
    # Default: K=100 for production-length trainings (r5h TPU A/B at
    # 800^2/100k: scan-100 steady state 120.0 ms/iter, dead-flat 24.0 s per
    # 200-iter mark, vs the per-step loop's ~168 ms/iter wall at 10k iters
    # [r5f] — the per-iter screen-grad stats fetch + view re-upload cost
    # ~48 ms/iter of tunnel overhead the chunk removes;
    # docs/tpu_logs/r5h_queue.log).  Short runs (tests, probes) stay
    # per-step so they don't pay the ~166 s chunk compile.
    default_k = "100" if cfg.iterations >= 1000 else "0"
    scan_k = int(os.environ.get("PIXIE_GS_SCAN", default_k))
    use_scan = scan_k > 1

    if use_scan:
        viewmats_dev = jnp.asarray(viewmats)
        images_dev = jnp.asarray(images)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def run_chunk(params, opt_state, ga, dn, vis):
            def body(carry, vi):
                params, opt_state, ga, dn = carry
                viewmat = viewmats_dev[vi]
                gt = images_dev[vi]
                offset = jnp.zeros((params["xyz"].shape[0], 2))

                def loss_fn(params, offset):
                    img, _ = render(params, viewmat, offset)
                    l1 = jnp.abs(img - gt).mean()
                    loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (
                        1.0 - ssim(img, gt)
                    )
                    return loss, l1

                (loss, l1), (grads, ograds) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(params, offset)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                sg = jnp.linalg.norm(ograds, axis=-1)
                seen = sg > 0
                ga = ga + jnp.where(seen, sg, 0.0)
                dn = dn + seen.astype(jnp.float32)
                return (params, opt_state, ga, dn), (loss, l1)

            (params, opt_state, ga, dn), (losses, l1s) = jax.lax.scan(
                body, (params, opt_state, ga, dn), vis
            )
            return params, opt_state, ga, dn, losses[-1], l1s[-1]

    grad_accum = np.zeros(capacity, np.float32)
    denom = np.zeros(capacity, np.float32)
    ga = jnp.zeros(capacity, jnp.float32)
    dn = jnp.zeros(capacity, jnp.float32)
    t0 = time.time()
    it = 1
    while it <= cfg.iterations:
        if use_scan:
            # stretch to the next host-side event boundary (events fire when
            # `it % interval == 0` after the step, so the chunk ends on the
            # smallest multiple of any interval >= it)
            nxt = min(
                -(-it // cfg.densify_interval) * cfg.densify_interval,
                -(-it // cfg.opacity_reset_interval)
                * cfg.opacity_reset_interval,
                -(-it // log_every) * log_every,
                cfg.iterations,
            )
            length = min(nxt - it + 1, scan_k)
            # scalar draws keep the exact per-step rng sequence
            vis = np.array(
                [rng.integers(len(viewmats)) for _ in range(length)],
                np.int32,
            )
            params, opt_state, ga, dn, loss, l1 = run_chunk(
                params, opt_state, ga, dn, jnp.asarray(vis)
            )
            it = it + length - 1  # event checks below run at the chunk end
        else:
            vi = int(rng.integers(len(viewmats)))
            params, opt_state, loss, l1, screen_grad = step(
                params, opt_state, jnp.asarray(viewmats[vi]),
                jnp.asarray(images[vi])
            )
            sg = np.asarray(screen_grad)
            seen = sg > 0
            grad_accum[seen] += sg[seen]
            denom[seen] += 1

        in_densify = cfg.densify_from <= it < cfg.densify_until
        if in_densify and it % cfg.densify_interval == 0:
            if use_scan:
                grad_accum = np.asarray(ga)
                denom = np.asarray(dn)
            merged = densify_and_prune(
                params, grad_accum, denom, cfg, active_n, spatial_scale, rng
            )
            active_n = len(merged["xyz"])
            new_capacity = int(2 ** np.ceil(np.log2(max(active_n, 2))))
            capacity = max(capacity, new_capacity)
            params = pad_params(
                {k: jnp.asarray(v) for k, v in merged.items()}, capacity
            )
            tx, opt_state = fresh_opt(params)
            grad_accum = np.zeros(capacity, np.float32)
            denom = np.zeros(capacity, np.float32)
            ga = jnp.zeros(capacity, jnp.float32)
            dn = jnp.zeros(capacity, jnp.float32)

        if it % cfg.opacity_reset_interval == 0:
            # np.array (copy): np.asarray of a jax array is read-only
            o = np.array(params["opacity"])
            o[:active_n] = np.minimum(o[:active_n], G.inverse_sigmoid(0.01))
            params = {**params, "opacity": jnp.asarray(o)}
            tx, opt_state = fresh_opt(params)

        if it % log_every == 0:
            logging.info(
                "gs iter %d loss %.4f l1 %.4f gaussians %d (%.1fs)",
                it, float(loss), float(l1), active_n, time.time() - t0,
            )
        it += 1

    out = output_dir / "point_cloud" / f"iteration_{cfg.iterations}"
    out.mkdir(parents=True, exist_ok=True)
    final = {k: np.asarray(v)[:active_n] for k, v in params.items()}
    G.save_gaussian_ply(out / "point_cloud.ply", final)
    logging.info("saved %d gaussians to %s", active_n, out)

    # train-view PSNR report (reference gaussian-splatting/train.py:100-112
    # logs train PSNR; we evaluate every view at the final iterate)
    from pixie_tpu.utils.metrics import psnr  # noqa: PLC0415

    render_jit = jax.jit(
        lambda p, vm: render(p, vm, jnp.zeros((p["xyz"].shape[0], 2)))[0]
    )
    psnrs = [
        psnr(np.clip(np.asarray(render_jit(params, jnp.asarray(vm))), 0, 1),
             img)
        for vm, img in zip(viewmats, images)
    ]
    metrics = {
        "psnr_per_view": [float(p) for p in psnrs],
        "psnr_mean": float(np.mean(psnrs)),
        "n_gaussians": int(active_n),
        "train_s": time.time() - t0,
    }
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "metrics.json").write_text(json.dumps(metrics, indent=1))
    logging.info("gs train PSNR %.2f dB over %d views",
                 metrics["psnr_mean"], len(psnrs))
    return final


def search_for_max_iteration(point_cloud_dir: str | Path) -> int:
    """searchForMaxIteration (gs_simulation.py:215-227)."""
    best = -1
    for p in Path(point_cloud_dir).glob("iteration_*"):
        try:
            best = max(best, int(p.name.split("_")[1]))
        except (IndexError, ValueError):
            continue
    return best


def main(argv=None):
    """3DGS training CLI (reference: gaussian-splatting/train.py -s <data>).
    Usage:
        python -m pixie_tpu.recon.train_gaussians --data <capture_dir> \
            --output <model_dir> [--iters N] [--downscale K]
    """
    import argparse  # noqa: PLC0415
    import logging  # noqa: PLC0415

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--data", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--downscale", type=int, default=1)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    train_gaussian_splatting(
        args.data, args.output, iterations=args.iters,
        image_downscale=args.downscale,
    )


if __name__ == "__main__":
    main()
