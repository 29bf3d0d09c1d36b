"""Narrative acceptance walkthrough — the `nbs/pixie.ipynb` analog.

The reference ships two notebooks (`nbs/pixie.ipynb`, `nbs/real_scene.ipynb`)
that act as its de-facto acceptance tests: run the pipeline on one asset,
then *look at every artifact* — the distilled field render, the voxel point
cloud, the VLM/neural segmentation, the per-property material field, and the
simulation videos.  This script is that walkthrough for the TPU rebuild: it
runs the CLI golden path on a synthetic asset (examples/pipeline_cli_e2e.py)
when artifacts are missing, then renders/inspects each artifact in order,
writing numbered PNG/mp4 files plus a printed narrative to --out/walkthrough.

Section <-> notebook-cell map (reference nbs/pixie.ipynb):
  1 field render      <- cell "Verify that the distilled NeRF field ..."
  2 voxel point cloud <- cell "Verify the voxel grid is correct"
  3 segmentation      <- get_vlm_results / material_segmentation cells
  4 material field    <- 5-panel viz(part_label, material_id, E, density, nu)
  5 simulation video  <- Video(.../frames/output.mp4) + gs_renders cells

Usage: python examples/walkthrough.py [--out /tmp/pixie_walkthrough] [--cpu]
"""

import argparse
import json
import logging
import subprocess
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
    ap.add_argument("--out", default="/tmp/pixie_walkthrough")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.WARNING)
    base = Path(args.out)
    wt = base / "walkthrough"
    wt.mkdir(parents=True, exist_ok=True)
    obj = "demo_obj"

    # ---- 0. pipeline golden path (pipeline.py CLI, idempotent) -----------
    section(0, "Run the pipeline (python pipeline.py obj_id=... analog)")
    mapped_ply = None
    for cand in (base / "render_outputs" / obj).rglob("mapped_preds*.ply") \
            if (base / "render_outputs" / obj).exists() else []:
        mapped_ply = cand
    if mapped_ply is None:
        cmd = [sys.executable, str(REPO / "examples" / "pipeline_cli_e2e.py"),
               "--out", str(base)] + (["--cpu"] if args.cpu else [])
        print("  artifacts missing -> running:", " ".join(cmd))
        t0 = time.time()
        subprocess.run(cmd, check=True)
        print(f"  pipeline done in {time.time() - t0:.0f}s")
    else:
        print("  artifacts found — reusing (delete --out to re-run)")

    render_out = base / "render_outputs" / obj
    from PIL import Image

    from pixie_tpu.utils.io import read_ply
    from pixie_tpu.utils.viz import compile_video, render_pointcloud_image

    # ---- 1. the distilled field ------------------------------------------
    section(1, "Verify the distilled field (held-out view render + PSNR)")
    from pixie_tpu.recon.field import NerfField, ProposalField, RenderConfig
    from pixie_tpu.recon.train_field import (
        load_blender_dataset,
        load_field_checkpoint,
        render_full_view,
    )
    from pixie_tpu.utils.metrics import psnr

    field_dir = base / "models" / obj / "f3rm"
    params = load_field_checkpoint(field_dir)
    meta_path = field_dir / "checkpoints" / "field_meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    encoding = meta.get("encoding", "mxu")
    ds = load_blender_dataset(base / "data" / obj)
    nerf = NerfField(encoding=encoding)
    napply = lambda p, pts, dirs, do: nerf.apply(p, pts, dirs, do)
    papply = None
    if "prop" in params:
        prop = ProposalField()
        papply = lambda p, pts: prop.apply(p, pts)
    vi = len(ds["images"]) - 1
    img = render_full_view(
        napply, None, params, ds["c2w"][vi], ds["intrinsics"], ds["hw"],
        RenderConfig(n_coarse=24, n_fine=16, bg_color=1.0),
        prop_apply=papply,
    )
    p = psnr(np.clip(img, 0, 1), ds["images"][vi])
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
        (256, 256), Image.NEAREST).save(wt / "01_field_render.png")
    Image.fromarray((ds["images"][vi] * 255).astype(np.uint8)).resize(
        (256, 256), Image.NEAREST).save(wt / "01_field_gt.png")
    print(f"  held-out view {vi}: PSNR {p:.1f} dB -> 01_field_render.png "
          f"(gt: 01_field_gt.png)")

    # ---- 2. the voxel grid ------------------------------------------------
    section(2, "Verify the voxel grid (clip_features_pc.ply)")
    pc_path = next(render_out.glob("*_pc.ply"))
    v = read_ply(pc_path)["vertex"]
    pts = np.column_stack([v["x"], v["y"], v["z"]])
    rgb = np.column_stack([v["red"], v["green"], v["blue"]]) / 255.0
    img = render_pointcloud_image(pts, colors=rgb, res=384)
    Image.fromarray((img * 255).astype(np.uint8)).save(wt / "02_voxel_pc.png")
    print(f"  {len(pts)} occupied voxels, bounds "
          f"{pts.min(0).round(3)}..{pts.max(0).round(3)} -> 02_voxel_pc.png")

    # ---- 3. segmentation --------------------------------------------------
    section(3, "Inspect the material segmentation")
    vlm_json = render_out / "chosen_vlm_results.json"
    if vlm_json.exists():
        chosen = json.loads(vlm_json.read_text())
        print("  VLM results:", json.dumps(chosen, indent=2)[:400])
    pred_path = next(base.rglob("sample_*_pred.npy"), None)
    if pred_path is not None:
        pred = np.load(pred_path)
        seg = pred[3:]
        cls = seg.argmax(0)
        uniq, counts = np.unique(cls, return_counts=True)
        print("  neural class histogram (class: voxels):",
              dict(zip(uniq.tolist(), counts.tolist())))

    # ---- 4. the material field -------------------------------------------
    section(4, "Inspect the material field (5-panel property viz)")
    mapped_ply = next(render_out.rglob("mapped_preds*.ply"))
    mv = read_ply(mapped_ply)["vertex"]
    mpts = np.column_stack([mv["x"], mv["y"], mv["z"]])
    panels = []
    for prop_name in ("part_label", "material_id", "E", "density", "nu"):
        vals = np.asarray(mv[prop_name], np.float32)
        discrete = prop_name in ("part_label", "material_id")
        if discrete:
            img = render_pointcloud_image(
                mpts, labels=vals.astype(np.int32), res=256)
        else:
            # continuous property: blue -> red colormap over the range
            t = (vals - vals.min()) / max(np.ptp(vals), 1e-9)
            cols = np.stack([t, 0.2 + 0.2 * t, 1.0 - t], axis=-1)
            img = render_pointcloud_image(mpts, colors=cols, res=256)
        panels.append((img * 255).astype(np.uint8))
        lo, hi = vals.min(), vals.max()
        print(f"  {prop_name:12s}: range [{lo:.3g}, {hi:.3g}]"
              + ("" if discrete else f" mean {vals.mean():.3g}"))
    strip = np.concatenate(panels, axis=1)
    Image.fromarray(strip).save(wt / "04_material_field.png")
    print("  -> 04_material_field.png "
          "(part_label | material_id | E | density | nu)")

    # ---- 5. the simulation ------------------------------------------------
    section(5, "Watch the simulation (point frames + video)")
    ply_frames = sorted(base.rglob("ply_files/frame_*.ply"))
    sim_dir = ply_frames[0].parent.parent if ply_frames else base / "sim_out"
    frames_dir = sim_dir / "frames"
    gs_frames = sorted(sim_dir.rglob("gs_frames/*.png"))
    if not frames_dir.exists() or not any(frames_dir.iterdir()):
        frames_dir.mkdir(parents=True, exist_ok=True)
        for f in ply_frames:
            fv = read_ply(f)["vertex"]
            img = render_pointcloud_image(
                np.column_stack([fv["x"], fv["y"], fv["z"]]),
                labels=np.asarray(fv["material_id"]), res=256)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                frames_dir / (f.stem + ".png"))
    video = wt / "05_simulation.mp4"
    ok = compile_video(frames_dir, video, fps=10)
    print(f"  {len(ply_frames)} frame PLYs; video "
          f"{'-> 05_simulation.mp4' if ok else 'skipped (no ffmpeg)'}")
    if gs_frames:
        gs_video = wt / "05_simulation_gs.mp4"
        compile_video(gs_frames[0].parent, gs_video, fps=10)
        print(f"  GS-rasterized frames found -> 05_simulation_gs.mp4")

    # ---- summary ----------------------------------------------------------
    section(6, "Artifact summary")
    for f in sorted(wt.iterdir()):
        print(f"  {f.name:28s} {f.stat().st_size / 1024:.0f} KB")
    print("\nWalkthrough complete — inspect the files under", wt)


if __name__ == "__main__":
    main()
