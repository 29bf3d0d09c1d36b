"""Real-scene acceptance walkthrough — the `nbs/real_scene.ipynb` analog.

The reference's second acceptance notebook drives a REAL capture (COLMAP
sparse model + photos) end-to-end: reconstruct with the COLMAP dataparser
(f3rm_config.py:40-52 ``USE_COLMAP_DATAPARSER``), voxelize, segment,
predict materials, and simulate at n_grid=120 (config/real_scene/*.json).
This script is that walkthrough for the TPU rebuild.  Real captures are
not available in this environment, so by default it fabricates a
synthetic COLMAP capture (the tests/test_colmap.py fixture: orbit
cameras + sparse points + images) — pass --data <capture_dir> to run on
a real one (expects images/ + sparse/0/{cameras,images,points3D}.bin).

Section <-> notebook-cell map (reference nbs/real_scene.ipynb):
  1 COLMAP ingest    <- dataparser cells (camera poses, seed point cloud)
  2 field training   <- ns-train f3rm cells (here: short budget run)
  3 3DGS training    <- gaussian-splatting train cells (seeded from
                        points3D, as scene/__init__.py fetchPly does)
  4 dataparser export<- dataparser_transforms.json consumed by
                        voxel/map_pred_to_coords.transform_nerf_to_world
  5 sim config       <- config/real_scene/*.json decode (n_grid=120)

Usage: python examples/real_scene_walkthrough.py [--data DIR] [--cpu]
       [--out /tmp/pixie_real_scene] [--iters 200]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def section(n, title):
    print(f"\n{'=' * 70}\n## {n}. {title}\n{'=' * 70}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="real COLMAP capture dir; default: synthetic fixture")
    ap.add_argument("--out", default="/tmp/pixie_real_scene")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.data is None:
        sys.path.insert(0, str(REPO / "tests"))
        from test_colmap import _write_synthetic_model  # noqa: PLC0415

        data = out / "capture"
        if not (data / "sparse").exists():
            data.mkdir(parents=True, exist_ok=True)
            _write_synthetic_model(data, n_views=8, n_pts=200)
        print(f"synthetic COLMAP capture at {data}")
    else:
        data = Path(args.data)

    section(1, "COLMAP ingest: poses, intrinsics, seed points")
    from pixie_tpu.recon.train_field import load_dataset

    ds = load_dataset(data)
    print(f"views: {ds['images'].shape[0]}  image {ds['hw']}  "
          f"intrinsics {tuple(round(v, 1) for v in ds['intrinsics'])}")
    print(f"dataparser scale: {ds['dataparser_scale']:.4f}  "
          f"seed points3d: {ds.get('points3d', np.zeros((0, 3))).shape[0]}")
    assert np.abs(ds["c2w"][:, :3, 3]).max() <= 1.0 + 1e-5, "auto-scale"

    section(2, "feature-field training (budget run)")
    from pixie_tpu.recon.train_field import (
        METHOD_CONFIGS,
        train_feature_field,
    )
    import dataclasses

    cfg = dataclasses.replace(METHOD_CONFIGS["nerfacto"],
                              max_iterations=args.iters, eval_views=1)
    t0 = time.time()
    train_feature_field(data, out / "field", cfg=cfg, log_every=args.iters)
    print(f"field trained {args.iters} iters in {time.time() - t0:.1f}s")
    dp = out / "field" / "dataparser_transforms.json"
    assert dp.exists(), "real-scene contract: dataparser_transforms.json"
    print(f"dataparser_transforms.json: {json.loads(dp.read_text())['scale']:.4f} scale")

    section(3, "3DGS training seeded from the sparse reconstruction")
    from pixie_tpu.recon.train_gaussians import (
        GSTrainConfig,
        train_gaussian_splatting,
    )

    gs_cfg = GSTrainConfig(iterations=max(args.iters // 2, 10),
                           densify_until=0, sh_degree=1)
    t0 = time.time()
    train_gaussian_splatting(data, out / "gs", cfg=gs_cfg,
                             log_every=max(args.iters // 2, 10))
    print(f"3DGS trained in {time.time() - t0:.1f}s (COLMAP points3d seed)")

    section(4, "train-space <-> world roundtrip (map_pred contract)")
    from pixie_tpu.recon.colmap import apply_dataparser_transform

    meta = json.loads(dp.read_text())
    pts_w = np.random.default_rng(0).uniform(-0.3, 0.3, (64, 3))
    p_train = apply_dataparser_transform(
        pts_w, meta["transform"], meta["scale"])
    t = np.eye(4)
    t[:3, :] = np.asarray(meta["transform"])
    back = (np.linalg.inv(t) @ np.concatenate(
        [p_train / meta["scale"], np.ones((64, 1))], 1).T).T[:, :3]
    err = np.abs(back - pts_w).max()
    print(f"world->train->world max err: {err:.2e}")
    assert err < 1e-4

    section(5, "real-scene sim config decode (n_grid=120 family)")
    from pixie_tpu.sim.params import decode_param_json

    cfg_path = REPO / "config" / "real_scene" / "custom_bonsai_config.json"
    sim = decode_param_json(cfg_path)
    mat = sim[0] if isinstance(sim, tuple) else sim
    print(f"bonsai decoded: n_grid={mat['n_grid']} grid_lim={mat['grid_lim']}")
    assert mat["n_grid"] == 120

    print("\nreal-scene walkthrough complete —", out)


if __name__ == "__main__":
    main()
