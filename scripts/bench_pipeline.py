"""Full neural-pipeline wall-clock on one asset (BASELINE north star #4).

Measures the production path voxelize -> U-Net -> map -> MPM rollout at
reference scale on the attached TPU, driving the real stage functions:

  1. voxelize: 64^3 x 768 CLIP-dim feature grid + occupancy funnel through
     a tcnn-scale field (12-level 2^19 hashgrid + 768-d feature head),
     voxel/voxelize.py extract_feature_voxel_grid — the `ns-export`/
     pixie/voxel/voxelize.py stage (reference voxelize.py:17-141);
  2. U-Net: joint material segmentation+regression pair at
     (1, 64^3, 768) bf16 (reference trainer/inference_combined.py);
  3. map: voxel/map_pred_to_coords.py map_pred_to_ply artifact contract;
  4. MPM: jelly rollout at 100k particles / n_grid 50, 400 substeps/frame
     (custom_tree_config.json:8-10 timestep scheme); a measured frame
     sample extrapolated to the reference's 125-frame tree rollout.

The field weights are random-init (same FLOPs/memory as trained) with an
analytic sphere occupancy bias so the mask funnel and particle counts see
a typical asset fill instead of init noise.

Run:  python scripts/bench_pipeline.py [--frames 5] [--out /tmp/pixie_bench_pipeline]
"""

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class BenchFieldAdapter:
    """FieldAdapter duck-type over random-init tcnn-scale networks.

    query()/get_rgb() run the full production networks (honest stage cost);
    the returned density adds an analytic sphere so the downstream funnel
    (alpha/gray/outlier/DBSCAN) and particle filling operate on a typical
    ~6% occupancy instead of init noise.
    """

    def __init__(self):
        import jax
        import jax.numpy as jnp

        from pixie_tpu.recon.field import FeatureField, NerfField

        self.nerf = NerfField()
        self.feat = FeatureField(feature_dim=768)
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((8, 3))
        self.nerf_p = self.nerf.init(rng, dummy, jnp.zeros((8, 3)), False)
        self.feat_p = self.feat.init(jax.random.fold_in(rng, 7), dummy)

        @jax.jit
        def _query(np_, fp, pts):
            pts01 = pts * 0.5 + 0.5
            density = self.nerf.apply(np_, pts01, None, True)
            feature = self.feat.apply(fp, pts01)
            # analytic occupancy: sphere r=0.35 at origin, smooth shell
            r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            sphere = 80.0 * jax.nn.sigmoid((0.35 - r) * 60.0)
            return density * 1e-3 + sphere, feature

        @jax.jit
        def _rgb(np_, pts):
            pts01 = pts * 0.5 + 0.5
            _, rgb = self.nerf.apply(np_, pts01, jnp.zeros_like(pts01), False)
            return rgb

        self._query_fn = _query
        self._rgb_fn = _rgb

        from pixie_tpu.voxel.voxelize import build_packed_grid_query

        self._packed_grid_fn = build_packed_grid_query(
            lambda params, pts: _query(params[0], params[1], pts),
            lambda params, pts: _rgb(params[0], pts))

    def query_packed_chunks(self, world_points, chunk_size, delta,
                            alpha_weighted=True):
        return self._packed_grid_fn(
            (self.nerf_p, self.feat_p), np.asarray(world_points, np.float32),
            chunk_size, delta, alpha_weighted)

    def query(self, pts):
        d, f = self._query_fn(self.nerf_p, self.feat_p, np.asarray(pts, np.float32))
        return {"density": d, "feature": f}

    def get_rgb(self, pts):
        return self._rgb_fn(self.nerf_p, np.asarray(pts, np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pixie_bench_pipeline")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--particles", type=int, default=100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # non-blocking tunnel warm: the handshake hides behind the field-adapter
    # compiles below; voxelize's internal warm_transfer() joins it later
    from pixie_tpu.utils.device import warm_dispatch
    warm_dispatch()

    out = Path(args.out)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    timings = {}

    # ---- stage 1: voxelize ------------------------------------------------
    from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

    field = BenchFieldAdapter()
    # warm the jits outside the timed region (the pipeline pays this once
    # per process; compile cache makes it ~seconds on reruns)
    field.query(np.zeros((65536, 3), np.float32))
    field.get_rgb(np.zeros((65536, 3), np.float32))
    t0 = time.time()
    # async_fetch mirrors pipeline.py's production wiring: the ~135 MB
    # sparse feature fetch + 400 MB npy save drain on a background thread
    # while the U-Net / map / MPM stages below consume the device buffer
    paths = extract_feature_voxel_grid(
        field, str(out / "grid_features.npz"), async_fetch=True)
    timings["voxelize_s"] = time.time() - t0
    vox_breakdown = dict(paths.get("timings", {}))
    print(f"[1/4] voxelize (64^3 x 768 + funnel): {timings['voxelize_s']:.2f}s"
          f" (feature fetch drains in background)"
          f" breakdown={ {k: round(v, 2) for k, v in vox_breakdown.items()} }",
          flush=True)

    # ---- stage 2: U-Net inference ----------------------------------------
    from pixie_tpu.models.joint import JointMaterialUNet

    mask = np.load(paths["mask"]).astype(bool)
    x = jnp.asarray(paths["features_dev"], jnp.bfloat16)[None]

    net = JointMaterialUNet(feature_channels=768, grid_size=64,
                            dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    fwd = jax.jit(lambda p, x: net.apply({"params": p}, x))
    seg, cont = jax.block_until_ready(fwd(params, x))  # compile
    t0 = time.time()
    seg, cont = jax.block_until_ready(fwd(params, x + jnp.bfloat16(1e-3)))
    timings["unet_s"] = time.time() - t0
    print(f"[2/4] U-Net pair (64^3 x 768): {timings['unet_s']:.3f}s", flush=True)

    # 11-channel sample_0_pred.npy contract: (3 cont + 8 seg, X, Y, Z)
    # channels-first (inference.py / map_pred_to_coords.py:57-58)
    pred = np.concatenate(
        [np.moveaxis(np.asarray(cont[0], np.float32), -1, 0),
         np.moveaxis(np.asarray(seg[0], np.float32), -1, 0)], axis=0)
    np.save(out / "sample_0_pred.npy", pred)

    # ---- stage 3: map pred -> PLY ----------------------------------------
    from pixie_tpu.utils.norm import REFERENCE_RANGES
    from pixie_tpu.voxel.map_pred_to_coords import map_pred_to_ply

    np.save(out / "mask.npy", mask.astype(np.float32))
    t0 = time.time()
    verts = map_pred_to_ply(
        out / "sample_0_pred.npy", out / "mask.npy", paths["npz"],
        out / "material.ply", "bench_asset", REFERENCE_RANGES,
    )
    timings["map_s"] = time.time() - t0
    print(f"[3/4] map pred->PLY ({len(verts)} voxels): {timings['map_s']:.2f}s",
          flush=True)

    # ---- stage 4: MPM rollout --------------------------------------------
    from pixie_tpu.sim.solver_fast import FastMPMSolver
    from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

    rng = np.random.default_rng(0)
    occ = np.stack(np.nonzero(mask), -1)
    # fill the occupied voxels with the target particle count (driver-style
    # density filling, sim/filling.py semantics at fixed count)
    sel = rng.integers(0, len(occ), args.particles)
    xpart = (occ[sel] + rng.uniform(0, 1, (args.particles, 3))) / 64.0
    xpart = (xpart * 0.5 + 0.75).astype(np.float32)  # world [0.75, 1.25]^3
    st = finalize_mu_lam(make_state(
        xpart, np.full(args.particles, (0.5 / 64) ** 3, np.float32),
        density=200.0, E=2e5, nu=0.3,
    ))
    cfg = MPMConfig(n_grid=50, grid_lim=2.0, gravity=(0.0, 0.0, -4.0),
                    active_materials=(0,))
    solver = FastMPMSolver(st, cfg, bcs=())
    solver.step_frame(4, 1e-4)  # compile
    jax.block_until_ready(solver._padded.x)
    frame_times = []
    for _ in range(args.frames):
        t0 = time.time()
        solver.step_frame(400, 1e-4)  # 400 substeps/frame (frame_dt 4e-2)
        jax.block_until_ready(solver._padded.x)
        frame_times.append(time.time() - t0)
    frame_s = float(np.median(frame_times))
    timings["mpm_frame_s"] = frame_s
    timings["mpm_125_frames_s"] = frame_s * 125
    print(f"[4/4] MPM frame (400 substeps @ {args.particles}): {frame_s:.2f}s"
          f" frames={[round(t, 2) for t in frame_times]}"
          f" -> 125-frame tree rollout {frame_s * 125:.1f}s", flush=True)

    # join the voxel-feature drain; whatever is still in flight here has
    # been overlapping stages 2-4 and would keep overlapping the remainder
    # of a real 125-frame rollout, so only the excess past that window
    # counts against the wall-clock
    t0 = time.time()
    vox_t = paths["wait"]()
    wait_extra = time.time() - t0
    for k, v in vox_t.items():
        timings[f"voxelize_{k}"] = v
    timings["fetch_wait_extra_s"] = wait_extra
    measured_window = timings["unet_s"] + timings["map_s"] + sum(frame_times)
    remaining_sim = timings["mpm_125_frames_s"] - sum(frame_times)
    unhidden = max(0.0, wait_extra - remaining_sim)
    timings["fetch_unhidden_s"] = unhidden
    print(f"[fetch] background drain: fetch {vox_t.get('fetch_bg_s', 0):.1f}s"
          f" + save {vox_t.get('save_feat_s', 0):.1f}s; overlapped stages"
          f" 2-4 ({measured_window:.1f}s measured), join cost after frames"
          f" {wait_extra:.1f}s -> unhidden vs 125-frame rollout"
          f" {unhidden:.1f}s", flush=True)

    total = (timings["voxelize_s"] + timings["unet_s"] + timings["map_s"]
             + timings["mpm_125_frames_s"] + unhidden)
    timings["pipeline_total_s"] = total
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}))


if __name__ == "__main__":
    main()
