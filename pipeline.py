"""E2E per-object pipeline: the same CLI surface as the reference's
``python pipeline.py obj_id=... material_mode=neural`` (reference
pipeline.py:438-517) rebuilt library-first — stages are in-process calls
with the same on-disk artifact contract and idempotent skip-if-output-exists
semantics (reference pipeline.py:77,121,144,176,240,283).

Stages (each skipped when its outputs exist unless ``overwrite=true``):
  1. download_assets        — Objaverse download (requires network; optional)
  2. render_blender_images  — external Blender (optional, gated on binary)
  3. train_nerf             — distilled-CLIP feature field (pixie_tpu.recon)
  4. train_gaussians        — 3DGS training (pixie_tpu.recon)
  5. generate_voxels        — feature field -> 64^3 grid + occupancy mask
  6. material segmentation  — neural: U-Net inference -> mapped_preds.ply
                              vlm: VLM labeling chain -> segmented_semantics.ply
  7. run_physics_simulation — MPM rollout + frame exports
"""

from __future__ import annotations

import logging
import shutil
import sys
import time
from pathlib import Path

from pixie_tpu.config import compose
from pixie_tpu.utils.paths import (
    create_directories,
    get_output_paths,
    resolve_paths,
    sample_dir,
    voxel_artifact_paths,
)


def set_logger():
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )


def stage_done(*paths) -> bool:
    return all(Path(p).exists() for p in paths)


def download_assets(cfg, paths):
    obj_dir = Path(paths["data_dir"])
    if stage_done(obj_dir) and any(obj_dir.iterdir() if obj_dir.exists() else []):
        logging.info("[download] %s exists, skipping", obj_dir)
        return
    try:
        import objaverse  # noqa: PLC0415

        objaverse.load_objects([cfg.obj_id])
    except Exception as e:  # noqa: BLE001
        logging.warning("[download] objaverse unavailable (%s); provide data manually", e)


def render_blender_images(cfg, paths):
    data_dir = Path(paths["data_dir"])
    if stage_done(data_dir / "transforms.json") and not cfg.overwrite:
        logging.info("[blender] transforms.json exists, skipping")
        return
    blender = str(cfg.paths.get("blender_path", "blender"))
    if shutil.which(blender) is None:
        logging.warning("[blender] blender binary not found; skipping render stage")
        return
    from pixie_tpu.utils.proc import run_cmd  # noqa: PLC0415

    glbs = list(Path(data_dir).glob("*.glb")) or list(
        Path(cfg.paths.data_dir).glob(f"{cfg.obj_id}*.glb")
    )
    if not glbs:
        raise FileNotFoundError(f"no GLB asset found for {cfg.obj_id} under {data_dir}")
    run_cmd([
        blender, "--background", "--python",
        "pixie_tpu/blender/generate_blendernerf_data.py", "--",
        "--glb", str(glbs[0]), "--out", str(data_dir),
        "--num-views", str(cfg.data_rendering.num_views),
        "--dist-min", str(cfg.data_rendering.camera_dist_min),
        "--dist-max", str(cfg.data_rendering.camera_dist_max),
        "--resolution", str(cfg.data_rendering.resolution),
    ])


def train_nerf(cfg, paths):
    out = Path(paths["nerf_output"])
    ckpt = out / "checkpoints" / "field"
    if ckpt.exists() and not cfg.overwrite:
        logging.info("[nerf] checkpoint exists, skipping")
        return
    from pixie_tpu.recon.train_field import train_feature_field  # noqa: PLC0415

    # CLIP distillation target: explicit path, else auto-extract from the
    # training views (the f3rm method's datamanager behavior; cached).
    features_path = cfg.training_3d.get("clip_features_path")
    if features_path is None and cfg.training_3d.get("distill_features", True):
        cache = out / "clip_patch_features.npy"
        if not cache.exists():
            try:
                from pixie_tpu.recon.clip_features import extract_clip_features  # noqa: PLC0415

                views = sorted(Path(paths["data_dir"]).glob("*.png"))
                extract_clip_features(views, cache_path=cache)
            except Exception as e:  # noqa: BLE001
                logging.warning(
                    "[nerf] CLIP extraction unavailable (%s); training "
                    "without feature distillation", e)
        if cache.exists():
            features_path = str(cache)

    import dataclasses  # noqa: PLC0415

    from pixie_tpu.recon.field import RenderConfig  # noqa: PLC0415
    from pixie_tpu.recon.train_field import FieldTrainConfig  # noqa: PLC0415

    t3 = cfg.training_3d
    fcfg = FieldTrainConfig(
        max_iterations=t3.nerf_max_num_iterations,
        rays_per_batch=t3.get("nerf_rays_per_batch", 4096),
        render=RenderConfig(n_coarse=t3.get("nerf_n_coarse", 64),
                            n_fine=t3.get("nerf_n_fine", 64)),
    )
    train_feature_field(
        data_dir=paths["data_dir"], output_dir=str(out),
        cfg=fcfg, features_path=features_path,
    )


def train_gaussians(cfg, paths):
    out = Path(paths["gs_output"])
    if (out / "point_cloud").exists() and not cfg.overwrite:
        logging.info("[gs] checkpoint exists, skipping")
        return
    from pixie_tpu.recon.train_gaussians import train_gaussian_splatting  # noqa: PLC0415

    train_gaussian_splatting(
        data_dir=paths["data_dir"], output_dir=str(out),
        iterations=cfg.training_3d.gs_iterations,
    )


def generate_voxels(cfg, paths):
    render_out = paths["render_output"]
    art = voxel_artifact_paths(render_out)
    if stage_done(art["features"], art["mask"]) and not (
        cfg.overwrite or cfg.overwrite_voxel
    ):
        logging.info("[voxels] artifacts exist, skipping")
        return
    from pixie_tpu.recon.field_adapter import load_field_adapter  # noqa: PLC0415
    from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid  # noqa: PLC0415

    field = load_field_adapter(paths["nerf_output"])
    b = cfg.voxelization.scene_bounds
    grid_size = cfg.voxelization.grid_size
    # async_fetch: the ~400 MB feature-grid host fetch + npy save drain on a
    # background thread while the U-Net / map / sim stages run off the
    # returned device buffer (remote tunnel moves 0.4-23 MB/s; DESIGN.md)
    vox = extract_feature_voxel_grid(
        field,
        art["npz"],
        bounds=(tuple(b.x_bound), tuple(b.y_bound), tuple(b.z_bound)),
        voxel_size=(b.x_bound[1] - b.x_bound[0]) / grid_size,
        batch_size=cfg.voxelization.batch_size,
        alpha_weighted=cfg.voxelization.alpha_weighted,
        alpha_threshold_for_mask=cfg.voxelization.alpha_threshold_for_mask,
        gray_threshold_for_mask=cfg.voxelization.gray_threshold,
        expected_grid=grid_size,
        async_fetch=True,
    )
    paths["_vox_handoff"] = vox


def _finish_voxel_fetch(paths):
    """Join the voxelizer's background feature drain (idempotent).  MUST be
    called before any stage reads clip_features_features.npy from disk."""
    vox = paths.get("_vox_handoff") or {}
    if "wait" in vox:
        t = vox["wait"]()
        logging.info("[voxels] background feature fetch drained "
                     "(fetch %.1fs, save %.1fs)",
                     t.get("fetch_bg_s", 0.0), t.get("save_feat_s", 0.0))
        vox.pop("wait", None)


def generate_neural_segmentation(cfg, paths):
    """U-Net inference -> mapped_preds.ply (pixie/utils.py:724-796)."""
    render_out = Path(paths["render_output"])
    neural_dir = Path(paths["neural_base_dir"])
    mapped_ply = render_out / f"sample_{cfg.physics.sample_id}" / "mapped_preds.ply"
    if mapped_ply.exists() and not cfg.overwrite:
        logging.info("[neural] %s exists, skipping", mapped_ply)
        return mapped_ply

    from pixie_tpu.train.data import MaterialVoxelDataset  # noqa: PLC0415
    from pixie_tpu.train.inference import run_inference  # noqa: PLC0415
    from pixie_tpu.train.trainer import latest_checkpoint  # noqa: PLC0415
    from pixie_tpu.utils.norm import load_normalization_ranges  # noqa: PLC0415
    from pixie_tpu.voxel.map_pred_to_coords import map_pred_to_ply  # noqa: PLC0415

    ranges_path = Path(cfg.paths.normalization_stats_dir) / "normalization_ranges.yaml"
    if not ranges_path.exists():
        # fall back to the repo-shipped dataset stats (normalization_stats/,
        # mirroring the reference's normalization_stats/ payload)
        ranges_path = Path(__file__).parent / "normalization_stats" / "normalization_ranges.yaml"
    ranges = load_normalization_ranges(ranges_path)

    seg_ckpt = latest_checkpoint(cfg.paths.discrete_checkpoint_dir)
    cont_ckpt = latest_checkpoint(cfg.paths.continuous_checkpoint_dir)
    if seg_ckpt is None or cont_ckpt is None:
        raise FileNotFoundError(
            f"U-Net checkpoints not found under "
            f"{cfg.paths.discrete_checkpoint_dir} / {cfg.paths.continuous_checkpoint_dir}"
        )

    # Fast path: the in-process voxelize stage hands its device-resident
    # feature grid straight to the U-Net, so inference runs while the
    # 400 MB feature npy is still draining to disk on the voxelizer's
    # background thread (see voxelize.extract_feature_voxel_grid).
    vox = paths.get("_vox_handoff") or {}
    art = voxel_artifact_paths(str(render_out))
    if "features_dev" in vox:
        import numpy as np  # noqa: PLC0415

        from pixie_tpu.train.inference import (  # noqa: PLC0415
            CombinedInference, infer_single_device, load_params,
        )

        g = cfg.training.default_grid_size
        want = (g, g, g, cfg.training.feature_channels)
        if tuple(vox["features_dev"].shape) != want:
            raise ValueError(
                f"device voxel grid {tuple(vox['features_dev'].shape)} != "
                f"{want} expected by the U-Net — did you change "
                f"voxelization.grid_size / training.default_grid_size / "
                f"training.feature_channels?")
        infer = CombinedInference(
            load_params(seg_ckpt), load_params(cont_ckpt),
            grid_size=cfg.training.default_grid_size,
            feature_channels=cfg.training.feature_channels,
            num_classes=cfg.training.num_material_classes,
            background_id=cfg.training.background_id,
        )
        infer_single_device(
            infer, vox["features_dev"], np.load(art["mask"]),
            cfg.obj_id, cfg.physics.sample_id, neural_dir,
        )
        mapped_ply.parent.mkdir(parents=True, exist_ok=True)
        map_pred_to_ply(
            pred_path=neural_dir / cfg.obj_id / f"sample_{cfg.physics.sample_id}_pred.npy",
            mask_path=art["mask"],
            grid_feature_path=art["npz"],
            output_path=mapped_ply,
            obj_id=cfg.obj_id,
            ranges=ranges,
        )
        return mapped_ply

    # Slow path (stage re-run in a fresh process): the dataset reads the
    # feature npy from disk, so the background drain must finish first.
    _finish_voxel_fetch(paths)

    # Fresh (unlabeled) objects have no GT material_grid.npy; the dataset
    # contract requires one, so synthesize a placeholder from the occupancy
    # mask (background everywhere outside it).  Metrics against it are
    # meaningless — the pipeline only needs the prediction.
    art0 = voxel_artifact_paths(str(render_out))
    mat_fp = render_out / f"sample_{cfg.physics.sample_id}" / "material_grid.npy"
    if not mat_fp.exists() and Path(art0["mask"]).exists():
        import numpy as np  # noqa: PLC0415

        occ = np.load(art0["mask"]) > 0
        placeholder = np.zeros((*occ.shape, 4), np.float32)
        placeholder[..., 0] = np.where(occ, 1000.0, 0.0)   # density
        placeholder[..., 1] = np.where(occ, 1e5, 0.0)      # E
        placeholder[..., 2] = np.where(occ, 0.3, 0.0)      # nu
        placeholder[..., 3] = np.where(occ, 0, cfg.training.background_id)
        mat_fp.parent.mkdir(parents=True, exist_ok=True)
        np.save(mat_fp, placeholder)
        logging.info("[neural] no GT material grid; wrote occupancy "
                     "placeholder (metrics will be meaningless)")

    dataset = MaterialVoxelDataset(
        render_out.parent, ranges,
        grid_size=cfg.training.default_grid_size,
        feature_channels=cfg.training.feature_channels,
        num_material_classes=cfg.training.num_material_classes,
        background_id=cfg.training.background_id,
        feature_type=cfg.training.feature_type,
        sample_id=cfg.physics.sample_id,
        enforce_mask_consistency=False,  # inference has no GT material grid
    )
    obj_indices = [
        i for i, s in enumerate(dataset.samples) if s.obj_id == cfg.obj_id
    ]
    if not obj_indices:
        raise RuntimeError(
            f"{cfg.obj_id} failed dataset validation (wrong feature dim or "
            f"grid size? expected ({cfg.training.default_grid_size}^3, "
            f"{cfg.training.feature_channels}))"
        )
    run_inference(
        dataset, seg_ckpt, cont_ckpt, neural_dir,
        batch_size=cfg.training.inference.batch_size, indices=obj_indices,
    )

    mapped_ply.parent.mkdir(parents=True, exist_ok=True)
    map_pred_to_ply(
        pred_path=neural_dir / cfg.obj_id / f"sample_{cfg.physics.sample_id}_pred.npy",
        mask_path=art["mask"],
        grid_feature_path=art["npz"],
        output_path=mapped_ply,
        obj_id=cfg.obj_id,
        ranges=ranges,
    )
    return mapped_ply


def generate_vlm_segmentation(cfg, paths):
    from pixie_tpu.vlm_labeler.chain import run_vlm_labeling_chain  # noqa: PLC0415

    # the VLM chain re-voxelizes / reads voxel artifacts from disk
    _finish_voxel_fetch(paths)
    return run_vlm_labeling_chain(cfg, paths)


def run_physics_simulation(cfg, paths, material_ply):
    out = Path(paths["physgaussian_output"]) / f"sample_{cfg.physics.sample_id}"
    if (out / "sim_info.json").exists() and not cfg.overwrite:
        logging.info("[sim] %s exists, skipping", out)
        return
    from pixie_tpu.sim.driver import run_simulation  # noqa: PLC0415

    # config resolution mirrors reference get_physics_config_path
    # (pixie/utils.py:370-375): objaverse objects use the per-class config,
    # real scenes a per-object one
    if cfg.get("is_objaverse_object", True):
        obj_class = cfg.obj_class or "tree"
        sim_cfg = (
            Path(cfg.paths.physgaussian_config_dir) / "objaverse"
            / f"custom_{obj_class}_config.json"
        )
    else:
        sim_cfg = (
            Path(cfg.paths.physgaussian_config_dir) / "real_scene"
            / f"custom_{cfg.obj_id}_config.json"
        )
    if not sim_cfg.exists():
        raise FileNotFoundError(f"physics config not found: {sim_cfg}")
    # simulate the GS checkpoint's gaussians when one exists so frames render
    # through the splat rasterizer (reference always passes --model_path,
    # pipeline.py:213-224); fall back to PLY-vertex particles otherwise
    gs_ckpt = Path(paths["gs_output"])
    has_gs = (gs_ckpt / "point_cloud").is_dir()
    render_img = bool(cfg.physics.get("render_img", True)) and has_gs
    # should_use_white_bg (pixie/utils.py:378-382)
    white_bg = bool(cfg.physics.white_bg)
    if (cfg.material_mode == "neural"
            and cfg.obj_class in list(cfg.physics.get("no_white_bg_classes", []))):
        white_bg = False
    run_simulation(
        point_cloud_path=material_ply,
        config_path=sim_cfg,
        output_dir=out,
        n_frames=cfg.physics.get("n_frames"),
        save_ply=cfg.physics.save_ply,
        debug=cfg.physics.debug,
        gaussian_checkpoint=gs_ckpt if has_gs else None,
        render_img=render_img,
        compile_video=bool(cfg.physics.get("compile_video", True)),
        white_bg=white_bg,
        checkpoint_every=int(cfg.physics.get("checkpoint_every", 0)),
        resume=bool(cfg.physics.get("resume", False)),
    )


def main(argv=None):
    set_logger()
    overrides = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(overrides=overrides)
    if not cfg.obj_id:
        raise ValueError("obj_id is required: python pipeline.py obj_id=...")
    cfg = resolve_paths(cfg)
    paths = get_output_paths(cfg, cfg.obj_id)
    create_directories(paths)

    # open the remote tunnel's device->host path NOW without blocking: the
    # handshake (60 s typical, 1477 s worst observed, r5a) completes in the
    # background behind the render/field stages; voxelize's warm_transfer()
    # joins it later at ~zero cost (see pixie_tpu/utils/device.py)
    from pixie_tpu.utils.device import warm_dispatch
    warm_dispatch()

    t0 = time.time()
    download_assets(cfg, paths)
    render_blender_images(cfg, paths)
    train_nerf(cfg, paths)
    train_gaussians(cfg, paths)
    generate_voxels(cfg, paths)
    if cfg.material_mode == "neural":
        material_ply = generate_neural_segmentation(cfg, paths)
    elif cfg.material_mode == "vlm":
        material_ply = generate_vlm_segmentation(cfg, paths)
    else:
        raise ValueError(f"unknown material_mode {cfg.material_mode!r}")
    run_physics_simulation(cfg, paths, material_ply)
    # the voxel feature npy may still be draining on its background thread
    # (it overlaps the neural/map/sim stages); join before declaring done
    _finish_voxel_fetch(paths)
    logging.info("pipeline complete in %.1fs", time.time() - t0)


if __name__ == "__main__":
    main()
