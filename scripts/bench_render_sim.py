"""Per-frame GS render cost inside the sim frame loop (VERDICT r3 #1 "done"
criterion: a per-frame render ms number for the native GS-rendered rollout).

Times SimRenderer.render_frame — the rebuild of the reference's in-loop
rasterize (gs_simulation.py:573-631: export x/cov -> undo transforms ->
convert_SH -> CUDA rasterizer) — at reference scale: 100k gaussians, 800^2,
orbit camera from the jelly-tree config's camera block.

Run:  python scripts/bench_render_sim.py [--gaussians 100000] [--frames 8]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--ply", action="store_true",
                    help="also time the per-frame gaussian PLY export")
    ap.add_argument("--max-tiles-side", type=int, default=None,
                    help="rasterizer candidate fan-out (default 6): sim "
                         "splats are small, so a tighter bound shrinks the "
                         "36N-key per-frame sort")
    ap.add_argument("--tile-cap", type=int, default=None)
    args = ap.parse_args()

    from pixie_tpu.sim.render_sim import SimRenderer

    g = args.gaussians
    rng = np.random.default_rng(0)

    # gaussian payload: a blob in the MPM cube around (1,1,1), degree-3 SH
    x_mpm = rng.uniform(0.8, 1.2, (g, 3)).astype(np.float32)
    s = rng.uniform(0.002, 0.008, (g, 3)).astype(np.float32)
    cov6 = np.stack([s[:, 0] ** 2, 0 * s[:, 0], 0 * s[:, 0],
                     s[:, 1] ** 2, 0 * s[:, 0], s[:, 2] ** 2], -1)
    shs = rng.normal(0, 0.3, (g, 16, 3)).astype(np.float32)
    shs[:, 0] += 1.0
    opacity = rng.uniform(0.3, 0.95, (g, 1)).astype(np.float32)

    camera_params = {
        # custom_tree_config.json camera block shape
        "mpm_space_viewpoint_center": [1.0, 1.0, 1.0],
        "mpm_space_vertical_upward_axis": [0.0, 0.0, 1.0],
        "default_camera_index": -1,
        "init_azimuthm": 0.0, "init_elevation": 20.0, "init_radius": 2.2,
        "move_camera": True, "delta_a": 1.0, "delta_e": 0.0, "delta_r": 0.0,
    }
    renderer = SimRenderer.from_camera_params(
        camera_params, model_path=None, n_frames=args.frames + 2,
        shs=shs, opacity_act=opacity, scale_origin=0.5,
        original_mean_pos=np.zeros(3, np.float32), rotation_matrices=[],
        z_shift=0.0,
    )
    renderer.width = renderer.height = args.res
    if args.max_tiles_side is not None:
        renderer.raster_opts["max_tiles_side"] = args.max_tiles_side
    if args.tile_cap is not None:
        renderer.raster_opts["tile_cap"] = args.tile_cap

    # compile + first frame (camera at frame 0)
    t0 = time.time()
    img, (pos_w, cov_w) = renderer.render_frame(0, x_mpm, cov6)
    print(f"render_frame compile+first: {time.time()-t0:.1f}s "
          f"img {img.shape} mean {img.mean():.4f}", flush=True)

    times = []
    for f in range(1, args.frames + 1):
        # perturb positions per frame (simulated motion; defeats dispatch dedup)
        xf = x_mpm + np.float32(0.002 * f)
        t0 = time.time()
        img, _ = renderer.render_frame(f, xf, cov6)
        times.append(time.time() - t0)
    frame_ms = float(np.median(times)) * 1e3

    # split device compute from tunnel transfer: pre-staged device inputs,
    # one block (no image fetch) = pure device render; the production driver
    # feeds solver-state device arrays, so THIS is its per-frame cost
    import jax

    staged = [jax.device_put(x_mpm + np.float32(0.002 * f))
              for f in range(1, args.frames + 1)]
    cov_dev = jax.device_put(cov6)
    dev_times = []
    for f, xf in enumerate(staged, start=1):
        t0 = time.time()
        img8, _ = renderer.render_frame(f, xf, cov_dev)
        # render_frame fetches the uint8 image; time a second variant too
        dev_times.append(time.time() - t0)
    dev_ms = float(np.median(dev_times)) * 1e3

    # pure device time: no image fetch at all (block_until_ready only)
    import jax.numpy as jnp

    sp = renderer._static_parts
    nof_times = []
    for f, xf in enumerate(staged, start=1):
        vm = jnp.asarray(np.asarray(renderer.viewmats[f], np.float32))
        t0 = time.time()
        img8, _pw, _cw = sp["render_jit"](
            sp["shs_dev"], sp["opacity_dev"], sp["u_pos_dev"],
            sp["u_cov_dev"], xf, cov_dev, vm)
        img8.block_until_ready()
        nof_times.append(time.time() - t0)
    nofetch_ms = float(np.median(nof_times)) * 1e3

    # pipelined fetch (the production driver loop, sim/driver.py): frame f
    # is dispatched with fetch=False, then frame f-1's image is fetched —
    # the tunnel transfer overlaps the device render of the next frame, so
    # steady-state cost/frame is max(device render, fetch), not their sum
    pip_times = []
    prev = None
    for f, xf in enumerate(staged, start=1):
        t0 = time.time()
        img_dev, _ = renderer.render_frame(f, xf, cov_dev, fetch=False)
        if prev is not None:
            np.asarray(prev)
        prev = img_dev
        pip_times.append(time.time() - t0)
    np.asarray(prev)
    pipelined_ms = float(np.median(pip_times[1:])) * 1e3

    out = {
        "gaussians": g,
        "resolution": args.res,
        "render_frame_ms": round(frame_ms, 1),
        "render_frame_devin_ms": round(dev_ms, 1),
        "render_frame_nofetch_ms": round(nofetch_ms, 1),
        "render_frame_pipelined_ms": round(pipelined_ms, 1),
        "frames_timed": args.frames,
        "raster_opts": renderer.raster_opts,
        "img_mean": round(float(np.asarray(img8).mean()), 4),
    }
    if args.ply:
        t0 = time.time()
        renderer.export_gaussian_ply("/tmp/bench_sim_frame.ply", pos_w, cov_w)
        out["ply_export_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
