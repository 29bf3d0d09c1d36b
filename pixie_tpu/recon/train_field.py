"""Feature-field (f3rm) training: the `ns-train f3rm` stage rebuilt.

Reference flow (pipeline.py:84-133 -> nerfstudio Trainer + f3rm plugin):
  * Blender/BlenderNeRF dataset: transforms(_train).json + PNGs;
  * CLIP ViT-L/14 patch features per image, NN-interpolated per ray
    (f3rm/features/clip_extract.py, feature_datamanager.py:106-124) — here
    optional: when a precomputed feature file is absent, training runs
    RGB-only (the voxelizer can still produce occupancy/rgb grids);
  * joint losses: RGB MSE + 1e-3 * feature MSE (f3rm/model.py:264-269);
  * 4096 rays/batch, Adam; 5k iterations in the pipeline
    (config/training_3d/default.yaml:4).

TPU-native: the whole train step (sampling, hierarchical render, both
losses, both optimizers) is one jit; rays are drawn on-device from a
pre-stacked image tensor.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixie_tpu.recon.field import (
    FeatureField,
    NerfField,
    ProposalField,
    RenderConfig,
    render_rays,
    render_rays_prop,
)


@dataclasses.dataclass
class FieldTrainConfig:
    max_iterations: int = 5000
    rays_per_batch: int = 4096
    lr: float = 1e-2
    lr_final: float = 1e-4
    feat_loss_weight: float = 1e-3
    feature_dim: int = 768
    seed: int = 42
    # "mxu" = gather-free MXU hash encoding (TPU fast path);
    # "hashgrid" = tcnn-layout gather encoding (fast on CPU)
    encoding: str = "mxu"
    eval_views: int = 2  # held-out views for the final PSNR report
    # proposal sampling (nerfacto proposal networks): n_coarse samples
    # through a tiny density field pick n_fine full-field samples
    use_proposal: bool = True
    prop_loss_weight: float = 1.0  # nerfacto interlevel_loss_mult
    render: RenderConfig = dataclasses.field(
        default_factory=lambda: RenderConfig(n_coarse=64, n_fine=32)
    )


# Method-config registry — the nerfstudio `method_configs` analog (reference
# f3rm/f3rm_config.py registers "f3rm" as a nerfacto variant; `ns-train
# <method>` selects one).  Values are FieldTrainConfig presets; extend by
# registering new entries.
METHOD_CONFIGS: dict[str, FieldTrainConfig] = {
    # f3rm: nerfacto + CLIP feature head, the pipeline default
    # (f3rm/f3rm_config.py:24-77)
    "f3rm": FieldTrainConfig(),
    # nerfacto: RGB-only (no distillation head)
    "nerfacto": FieldTrainConfig(feat_loss_weight=0.0),
    # quick preview profile (ns-train nerfacto --steps-per-save style short
    # runs used by the curation filters)
    "f3rm-lite": FieldTrainConfig(
        max_iterations=2000, rays_per_batch=2048,
        render=RenderConfig(n_coarse=48, n_fine=32),
    ),
}


def load_blender_dataset(data_dir: str | Path, max_images: int | None = None):
    """Load a BlenderNeRF/Blender-format dataset: transforms.json + images.

    Returns dict with images (N,H,W,3) float32 in [0,1], c2w (N,4,4),
    intrinsics (fx, fy, cx, cy) and optional per-image feature maps.
    """
    from PIL import Image  # noqa: PLC0415

    data_dir = Path(data_dir)
    tf_path = None
    for cand in ("transforms.json", "transforms_train.json"):
        if (data_dir / cand).exists():
            tf_path = data_dir / cand
            break
    if tf_path is None:
        raise FileNotFoundError(f"no transforms json in {data_dir}")
    meta = json.loads(tf_path.read_text())

    frames = meta["frames"][:max_images]
    images, poses = [], []
    for fr in frames:
        p = data_dir / fr["file_path"]
        if not p.suffix:
            p = p.with_suffix(".png")
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        images.append(img)
        poses.append(np.asarray(fr["transform_matrix"], np.float32))
    images = np.stack(images)
    poses = np.stack(poses)
    h, w = images.shape[1:3]

    if "camera_angle_x" in meta:
        fx = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
        fy = fx
    else:
        fx, fy = meta["fl_x"], meta["fl_y"]
    cx = meta.get("cx", w / 2.0)
    cy = meta.get("cy", h / 2.0)
    return {
        "images": images, "c2w": poses,
        "intrinsics": (float(fx), float(fy), float(cx), float(cy)),
        "hw": (h, w),
    }


def load_dataset(data_dir: str | Path, max_images: int | None = None):
    """Capture-format dispatcher: Blender/BlenderNeRF ``transforms.json``
    or a COLMAP sparse model (real-scene captures — the reference's
    USE_COLMAP_DATAPARSER switch, f3rm/f3rm_config.py:40-52).  Both return
    the same {images, c2w, intrinsics, hw} contract; COLMAP adds the
    dataparser transform/scale + seed points3d."""
    data_dir = Path(data_dir)
    for cand in ("transforms.json", "transforms_train.json"):
        if (data_dir / cand).exists():
            return load_blender_dataset(data_dir, max_images)
    from pixie_tpu.recon.colmap import (  # noqa: PLC0415
        is_colmap_capture, load_colmap_dataset)

    if is_colmap_capture(data_dir):
        return load_colmap_dataset(data_dir, max_images)
    raise FileNotFoundError(
        f"{data_dir}: neither a transforms.json capture nor a COLMAP "
        f"sparse model")


def make_ray_fn(dataset, feature_maps=None):
    """Device-side random ray sampler: (rng, n) -> origins, dirs, rgb[, feat].

    feature_maps (N, Hf, Wf, C): per-image CLIP patch features; the target for
    a ray is the nearest patch (feature_datamanager.py:106-124 NN lookup).
    """
    images = jnp.asarray(dataset["images"])
    c2w = jnp.asarray(dataset["c2w"])
    fx, fy, cx, cy = dataset["intrinsics"]
    n_img, h, w = images.shape[0], images.shape[1], images.shape[2]
    if feature_maps is not None:
        feature_maps = jnp.asarray(feature_maps)

    def sample(rng, n):
        k1, k2, k3 = jax.random.split(rng, 3)
        img_idx = jax.random.randint(k1, (n,), 0, n_img)
        px = jax.random.randint(k2, (n,), 0, w)
        py = jax.random.randint(k3, (n,), 0, h)
        rgb = images[img_idx, py, px]
        # Blender convention: camera looks down -z, y up
        dirs_cam = jnp.stack(
            [
                (px.astype(jnp.float32) + 0.5 - cx) / fx,
                -(py.astype(jnp.float32) + 0.5 - cy) / fy,
                -jnp.ones((n,), jnp.float32),
            ],
            axis=-1,
        )
        rot = c2w[img_idx, :3, :3]
        dirs = jnp.einsum("nij,nj->ni", rot, dirs_cam)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = c2w[img_idx, :3, 3]
        if feature_maps is not None:
            hf, wf = feature_maps.shape[1], feature_maps.shape[2]
            fy_i = jnp.clip((py * hf) // h, 0, hf - 1)
            fx_i = jnp.clip((px * wf) // w, 0, wf - 1)
            # one-hot MXU row-select instead of a dynamic gather over the
            # patch table (n_img*hf*wf ~ 12k rows): a dense (n, 12k) @
            # (12k, 768) HIGHEST-precision dot returns bit-identical rows
            # and, unlike the gather, compiles in seconds instead of
            # 1248 s (r5b profile stage A).  Runtime measured ~neutral
            # (r5e A/B: 306.8 all-on vs 304.2 no-onehot), but the
            # fully-measured record config is all-off (250.4 ms,
            # docs/tpu_logs/r5e_queue.log), so default off; set =1 on a
            # cold compile cache to skip the gather's pathological
            # compile.  Env gate for on-TPU A/B attribution.
            flat = (img_idx * hf + fy_i) * wf + fx_i
            if os.environ.get("PIXIE_FEAT_ONEHOT", "0") == "1":
                fm2 = feature_maps.reshape(-1, feature_maps.shape[-1])
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (n, fm2.shape[0]), 1)
                    == flat[:, None]).astype(feature_maps.dtype)
                feat_gt = jax.lax.dot_general(
                    oh, fm2, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
            else:
                feat_gt = feature_maps[img_idx, fy_i, fx_i]
            return origins, dirs, rgb, feat_gt
        return origins, dirs, rgb, None

    return sample


def make_view_rays(c2w: np.ndarray, intrinsics, hw):
    """All pixel rays of one camera (origins, dirs), Blender convention."""
    fx, fy, cx, cy = intrinsics
    h, w = hw
    px, py = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack(
        [(px + 0.5 - cx) / fx, -(py + 0.5 - cy) / fy, -np.ones_like(px)],
        axis=-1,
    ).astype(np.float32)
    dirs = dirs_cam.reshape(-1, 3) @ np.asarray(c2w[:3, :3], np.float32).T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(
        np.asarray(c2w[:3, 3], np.float32), dirs.shape
    ).copy()
    return origins, dirs


def render_full_view(nerf_apply, feat_apply, params, c2w, intrinsics, hw,
                     rcfg: RenderConfig, chunk: int = 4096, prop_apply=None):
    """Render one full image (rgb, accumulation) in ray chunks."""
    origins, dirs = make_view_rays(c2w, intrinsics, hw)
    n = origins.shape[0]
    rows = []
    if prop_apply is not None and "prop" in params:
        rfn = jax.jit(
            lambda o, d: render_rays_prop(
                prop_apply, nerf_apply, feat_apply, params["prop"],
                params["nerf"], params.get("feat"), o, d,
                jax.random.PRNGKey(0), rcfg, train=False,
                with_features=False,
            )["rgb"]
        )
    else:
        rfn = jax.jit(
            lambda o, d: render_rays(
                nerf_apply, feat_apply, params["nerf"], params.get("feat"),
                o, d, jax.random.PRNGKey(0), rcfg, train=False,
                with_features=False,
            )["rgb"]
        )
    for i in range(0, n, chunk):
        o = origins[i : i + chunk]
        d = dirs[i : i + chunk]
        if len(o) < chunk:
            pad = chunk - len(o)
            o = np.pad(o, ((0, pad), (0, 0)))
            d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            rows.append(np.asarray(rfn(jnp.asarray(o), jnp.asarray(d)))[: chunk - pad])
        else:
            rows.append(np.asarray(rfn(jnp.asarray(o), jnp.asarray(d))))
    return np.concatenate(rows).reshape(hw[0], hw[1], 3)


def evaluate_field(params, dataset, view_indices, nerf_apply, feat_apply,
                   rcfg: RenderConfig, prop_apply=None) -> dict:
    """Test-view PSNR over held-out views (nerfstudio eval-loop analog;
    reference PSNR reporting: gaussian-splatting/train.py:100-112)."""
    from pixie_tpu.utils.metrics import psnr  # noqa: PLC0415

    vals = []
    for vi in view_indices:
        img = render_full_view(
            nerf_apply, feat_apply, params, dataset["c2w"][vi],
            dataset["intrinsics"], dataset["hw"], rcfg,
            prop_apply=prop_apply,
        )
        vals.append(psnr(img, dataset["images"][vi]))
    return {"psnr_per_view": vals,
            "psnr_mean": float(np.mean(vals)) if vals else float("nan")}


def train_feature_field(
    data_dir: str | Path,
    output_dir: str | Path,
    max_iterations: int = 5000,
    features_path: str | Path | None = None,
    cfg: FieldTrainConfig | None = None,
    log_every: int = 500,
):
    """Train nerf + (optional) feature field; writes an orbax checkpoint."""
    cfg = cfg or FieldTrainConfig(max_iterations=max_iterations)
    output_dir = Path(output_dir)
    dataset = load_dataset(data_dir)
    if "dataparser_transform" in dataset:
        # real-scene contract: the voxel/map stages undo this to get world
        # coordinates (map_pred_to_coords.transform_nerf_to_world)
        from pixie_tpu.recon.colmap import (  # noqa: PLC0415
            write_dataparser_transforms)

        write_dataparser_transforms(
            output_dir / "dataparser_transforms.json",
            dataset["dataparser_transform"], dataset["dataparser_scale"])
    with_features = features_path is not None and Path(features_path).exists()
    feature_maps = np.load(features_path) if with_features else None
    if feature_maps is not None:
        cfg = dataclasses.replace(cfg, feature_dim=int(feature_maps.shape[-1]))

    # hold out the last eval_views frames for the test-view PSNR report
    # (nerfstudio's train/eval split analog)
    n_frames = len(dataset["images"])
    n_eval = min(cfg.eval_views, max(0, n_frames - 2))
    eval_indices = list(range(n_frames - n_eval, n_frames))
    train_ds = dict(dataset)
    if n_eval:
        train_ds["images"] = dataset["images"][: n_frames - n_eval]
        train_ds["c2w"] = dataset["c2w"][: n_frames - n_eval]
        fm_train = feature_maps[: n_frames - n_eval] if with_features else None
    else:
        fm_train = feature_maps
    sample_rays = make_ray_fn(train_ds, fm_train)
    nerf = NerfField(encoding=cfg.encoding)
    feat = (FeatureField(feature_dim=cfg.feature_dim, encoding=cfg.encoding)
            if with_features else None)
    prop = ProposalField() if cfg.use_proposal else None

    rng = jax.random.PRNGKey(cfg.seed)
    dummy = jnp.zeros((8, 3))
    params = {
        "nerf": nerf.init(rng, dummy, jnp.zeros((8, 3)), False),
    }
    if with_features:
        params["feat"] = feat.init(jax.random.fold_in(rng, 7), dummy)
    if prop is not None:
        params["prop"] = prop.init(jax.random.fold_in(rng, 13), dummy)

    sched = optax.exponential_decay(
        cfg.lr, cfg.max_iterations, cfg.lr_final / cfg.lr
    )
    tx = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    nerf_apply = lambda p, pts, dirs, density_only: nerf.apply(
        p, pts, dirs, density_only
    )
    feat_apply = (lambda p, pts: feat.apply(p, pts)) if with_features else None
    prop_apply = (lambda p, pts: prop.apply(p, pts)) if prop is not None else None

    def step_impl(params, opt_state, rng):
        kray, krender = jax.random.split(rng)
        origins, dirs, rgb_gt, feat_gt = sample_rays(kray, cfg.rays_per_batch)

        def loss_fn(params):
            if prop is not None:
                out = render_rays_prop(
                    prop_apply, nerf_apply, feat_apply, params["prop"],
                    params["nerf"], params.get("feat"), origins, dirs,
                    krender, cfg.render, train=True,
                    with_features=with_features,
                )
            else:
                out = render_rays(
                    nerf_apply, feat_apply, params["nerf"],
                    params.get("feat"), origins, dirs, krender, cfg.render,
                    train=True, with_features=with_features,
                )
            loss = jnp.mean((out["rgb"] - rgb_gt) ** 2)
            aux = {"rgb_loss": loss}
            if prop is not None:
                # interlevel loss trains the proposal field (mip-NeRF 360)
                loss = loss + cfg.prop_loss_weight * out["prop_loss"]
                aux["prop_loss"] = out["prop_loss"]
            if with_features:
                # feature MSE at 1e-3 weight (f3rm/model.py:264-269)
                floss = jnp.mean((out["feature"] - feat_gt) ** 2)
                loss = loss + cfg.feat_loss_weight * floss
                aux["feat_loss"] = floss
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    step = jax.jit(step_impl)

    # Device-resident K-step chunks: one lax.scan dispatch per K iterations
    # instead of K host dispatches.  Over the axon tunnel each dispatch
    # carries host-side enqueue latency (~40 ms floor, r5b profile stage A),
    # so at 5000 iterations the per-step loop pays minutes of pure tunnel
    # overhead the scan removes.  The lr schedule rides in opt_state
    # (optax count), so chunking is semantics-preserving; rng is split
    # identically to the per-step loop (parity test:
    # tests/test_recon.py::test_scan_chunk_loop_matches_per_step_loop).
    # Default: K=50 for production-length trainings (r5f TPU A/B at 5000
    # iters: 2066.3 s per-step vs 1844.1 s scan-50 end-to-end incl. compile,
    # docs/tpu_logs/r5f_queue.log — an 11% wall-clock win); short runs
    # (tests, probes) stay per-step so they don't pay the chunk compile.
    default_k = "50" if cfg.max_iterations >= 1000 else "0"
    scan_k = int(os.environ.get("PIXIE_FIELD_SCAN", default_k))

    if scan_k > 1:
        import functools  # noqa: PLC0415

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run_chunk(params, opt_state, rng):
            def body(carry, _):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                params, opt_state, loss, _aux = step_impl(
                    params, opt_state, sub)
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, rng), length=scan_k)
            return params, opt_state, rng, losses

    t0 = time.time()
    it = 0
    loss = jnp.float32(0.0)
    while it < cfg.max_iterations:
        if scan_k > 1 and it + scan_k <= cfg.max_iterations:
            params, opt_state, rng, losses = run_chunk(params, opt_state, rng)
            loss = losses[-1]
            it += scan_k
            if (it // scan_k) % max(log_every // scan_k, 1) == 0:
                logging.info("field iter %d loss %.5f (%.1fs)", it,
                             float(loss), time.time() - t0)
        else:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, aux = step(params, opt_state, sub)
            if it % log_every == 0:
                logging.info("field iter %d loss %.5f (%.1fs)", it,
                             float(loss), time.time() - t0)
            it += 1

    save_field_checkpoint(output_dir, params, cfg)

    metrics = {"train_s": time.time() - t0, "final_loss": float(loss)}
    if eval_indices:
        metrics.update(evaluate_field(
            params, dataset, eval_indices, nerf_apply, feat_apply, cfg.render,
            prop_apply=prop_apply,
        ))
        logging.info("field eval PSNR %.2f dB over views %s",
                     metrics["psnr_mean"], eval_indices)
    (output_dir / "metrics.json").write_text(json.dumps(metrics, indent=1))
    return params


def save_field_checkpoint(output_dir: str | Path, params, cfg: FieldTrainConfig):
    import orbax.checkpoint as ocp  # noqa: PLC0415

    path = Path(output_dir).resolve() / "checkpoints" / "field"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    meta = {"feature_dim": cfg.feature_dim,
            "with_features": "feat" in params,
            "encoding": cfg.encoding}
    (path.parent / "field_meta.json").write_text(json.dumps(meta))
    logging.info("saved field checkpoint to %s", path)


def load_field_checkpoint(output_dir: str | Path):
    import orbax.checkpoint as ocp  # noqa: PLC0415

    path = Path(output_dir).resolve() / "checkpoints" / "field"
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def main(argv=None):
    """ns-train-equivalent CLI (reference: `ns-train f3rm --data <dir>`;
    SURVEY §2.2).  Usage:
        python -m pixie_tpu.recon.train_field --data <capture_dir> \
            --output <out_dir> [--features clip_features.npy] [--iters N]
    """
    import argparse  # noqa: PLC0415

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--data", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="f3rm", choices=sorted(METHOD_CONFIGS),
                    help="method preset (ns-train <method> analog)")
    ap.add_argument("--features", default=None,
                    help="per-view CLIP patch features npy (enables the "
                    "feature head, f3rm distillation)")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=500)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    cfg = METHOD_CONFIGS[args.method]
    if args.iters is not None:
        cfg = dataclasses.replace(cfg, max_iterations=args.iters)
    train_feature_field(
        args.data, args.output, cfg=cfg,
        features_path=args.features, log_every=args.log_every,
    )


if __name__ == "__main__":
    main()
