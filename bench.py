"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): full neural-pipeline step throughput on one chip —
U-Net voxel grids/sec (64^3 x 768 CLIP grid -> material fields) and MPM
substeps/sec @100k particles.  The single JSON line reports the U-Net
inference rate (the pipeline's central compute stage); auxiliary numbers are
printed to stderr for tracking.

Usage:  python bench.py [--quick] [--particles N] [--skip-mpm]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_unet(batch: int, iters: int, grid: int = 64, feat_ch: int = 768):
    import jax
    import jax.numpy as jnp

    from pixie_tpu.models.unet3d import RegressionUNet, SegmentationUNet

    seg = SegmentationUNet(feature_channels=feat_ch, grid_size=grid)
    cont = RegressionUNet(feature_channels=feat_ch, grid_size=grid)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, grid, grid, grid, feat_ch), jnp.bfloat16)
    seg_p = seg.init(rng, x)["params"]
    cont_p = cont.init(rng, x)["params"]
    # distinct input buffers per iteration: this runtime caches identical
    # dispatches, which silently invalidates repeated-same-input timing loops
    keys = jax.random.split(rng, iters)
    xs = [jax.random.normal(k, x.shape, x.dtype) for k in keys]
    jax.block_until_ready(xs)

    @jax.jit
    def fwd(seg_p, cont_p, x):
        return seg.apply({"params": seg_p}, x), cont.apply({"params": cont_p}, x)

    t0 = time.time()
    out = fwd(seg_p, cont_p, xs[0])
    jax.block_until_ready(out)
    log(f"unet compile+first: {time.time()-t0:.1f}s")

    t0 = time.time()
    outs = [fwd(seg_p, cont_p, xi) for xi in xs]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    grids_per_sec = batch / dt
    log(f"unet: {dt*1e3:.1f}ms/batch{batch} = {grids_per_sec:.2f} grids/s")
    return grids_per_sec


def bench_mpm(n_particles: int, substeps: int, reps: int, fast: bool = True):
    import jax
    import jax.numpy as jnp

    from pixie_tpu.sim.solver import simulate_substeps
    from pixie_tpu.sim.solver_fast import FastMPMSolver
    from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

    rng = np.random.default_rng(0)
    x = rng.uniform(0.75, 1.25, (n_particles, 3)).astype(np.float32)
    st = finalize_mu_lam(
        make_state(x, np.full(n_particles, 1e-6, np.float32), density=200.0,
                   E=2e5, nu=0.4)
    )
    cfg = MPMConfig(n_grid=50, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))

    if fast:
        solver = FastMPMSolver(st, cfg)
        t0 = time.time()
        solver.step_frame(substeps, 1e-4)
        log(f"mpm (pallas tiled) compile+first: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(reps):
            solver.step_frame(substeps, 1e-4)
        rate = substeps * reps / (time.time() - t0)
        log(f"mpm: {rate:.0f} substeps/s @ {n_particles} particles (pallas)")
        return rate

    t0 = time.time()
    out = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(1e-4), substeps)
    jax.block_until_ready(out.x)
    log(f"mpm compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        out = simulate_substeps(out, cfg, (), jnp.float32(0.0), jnp.float32(1e-4), substeps)
    jax.block_until_ready(out.x)
    rate = substeps * reps / (time.time() - t0)
    log(f"mpm: {rate:.0f} substeps/s @ {n_particles} particles")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes, CPU-safe")
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--skip-mpm", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    if args.quick:
        unet_rate = bench_unet(batch=1, iters=2, grid=16, feat_ch=32)
        mpm_rate = None if args.skip_mpm else bench_mpm(2000, 20, 2, fast=False)
    else:
        unet_rate = bench_unet(batch=args.batch, iters=10)
        mpm_rate = None if args.skip_mpm else bench_mpm(args.particles, 100, 3)

    if mpm_rate is not None:
        log(f"aux: mpm_substeps_per_s={mpm_rate:.1f}")

    # Reference baseline: no published numbers exist (BASELINE.md) — the
    # reference's inference_combined on A100 processes ~O(10) grids/s;
    # vs_baseline is reported as a ratio against a 10 grids/s placeholder
    # until the driver records a measured reference number.
    baseline_grids_per_sec = 10.0
    print(
        json.dumps(
            {
                "metric": "unet_voxel_grids_per_sec",
                "value": round(float(unet_rate), 3),
                "unit": "grids/s (64^3x768 CLIP -> 8-class + 3-channel material fields)",
                "vs_baseline": round(float(unet_rate) / baseline_grids_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
