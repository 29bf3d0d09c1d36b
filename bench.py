"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): U-Net voxel grids/sec (64^3 x 768 CLIP grid ->
material fields) on one chip; auxiliary MPM substeps/sec on stderr.

Measurement discipline (docs/DESIGN.md "Benchmarking traps"): this runtime
both dedupes identical dispatches AND reports readiness early for some async
dispatch chains, so every timed iteration (a) varies its inputs and (b) is
forced by fetching a scalar VALUE to the host.

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
    """Both material U-Nets on one 64^3x768 grid, as the lane-packed joint
    net (models/joint.py: exact block-diagonal fusion of the seg + cont
    passes; one grid/iteration == one full seg+cont prediction)."""
    import jax
    import jax.numpy as jnp

    from pixie_tpu.models.joint import JointMaterialUNet

    net = JointMaterialUNet(feature_channels=feat_ch, grid_size=grid,
                            dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, grid, grid, grid, feat_ch), jnp.bfloat16)
    params = net.init(rng, x)["params"]
    base = jax.random.normal(rng, x.shape, x.dtype)

    @jax.jit
    def fwd(p, x, eps):
        x = x + eps.astype(x.dtype)
        seg_logits, cont_pred = net.apply({"params": p}, x)
        # scalar probe: fetching its VALUE forces real completion
        return jnp.float32(seg_logits.mean()) + jnp.float32(cont_pred.mean())

    t0 = time.time()
    float(fwd(params, base, jnp.float32(0.0)))
    log(f"unet compile+first: {time.time()-t0:.1f}s")

    # pipelined dispatch: enqueue all iterations (distinct inputs, so no
    # dispatch dedup), then force every scalar VALUE.  Serial fetch-per-iter
    # would bill ~30 ms of remote-runtime round-trip latency per iteration
    # to the device (profiler: 67 ms device vs 98 ms serial-fetch wall).
    t0 = time.time()
    outs = [fwd(params, base, jnp.float32(1e-6 * (i + 1))) for i in range(iters)]
    acc = sum(float(o) for o in outs)
    dt = (time.time() - t0) / iters
    grids_per_sec = batch / dt
    log(f"unet: {dt*1e3:.1f}ms/batch{batch} = {grids_per_sec:.2f} grids/s "
        f"(probe {acc:.3f})")
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

        def force():
            return float(jnp.sum(solver._padded.x))

        t0 = time.time()
        solver.step_frame(substeps, 1e-4)
        force()
        log(f"mpm (pallas tiled) compile+first: {time.time()-t0:.1f}s")
        # warm: absorb resort-induced shape recompiles before timing
        for _ in range(2):
            solver.step_frame(substeps, 1e-4)
            force()
        times = []
        for _ in range(reps):
            t0 = time.time()
            solver.step_frame(substeps, 1e-4)
            force()
            times.append(time.time() - t0)
        rate = substeps / float(np.median(times))
        log(f"mpm: {rate:.0f} substeps/s @ {n_particles} particles (pallas, "
            f"median of {reps})")
        return rate

    t0 = time.time()
    out = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(1e-4), substeps)
    float(jnp.sum(out.x))
    log(f"mpm compile+first: {time.time()-t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = simulate_substeps(out, cfg, (), jnp.float32(0.0), jnp.float32(1e-4),
                                substeps)
        float(jnp.sum(out.x))
        times.append(time.time() - t0)
    rate = substeps / float(np.median(times))
    log(f"mpm: {rate:.0f} substeps/s @ {n_particles} particles")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes, CPU-safe")
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--skip-mpm", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    if args.quick:
        mpm_particles = 2000
        unet_rate = bench_unet(batch=1, iters=2, grid=16, feat_ch=64)
        mpm_rate = None if args.skip_mpm else bench_mpm(mpm_particles, 20, 2,
                                                        fast=False)
    else:
        mpm_particles = args.particles
        unet_rate = bench_unet(batch=args.batch, iters=10)
        mpm_rate = None if args.skip_mpm else bench_mpm(mpm_particles, 100, 5)

    if mpm_rate is not None:
        log(f"aux: mpm_substeps_per_s={mpm_rate:.1f}")

    # Reference baseline: no published numbers exist (BASELINE.md); ratio is
    # against a 10 grids/s placeholder until the driver measures the
    # reference's inference_combined on its own hardware.
    baseline_grids_per_sec = 10.0
    out = {
        "metric": "unet_voxel_grids_per_sec",
        "value": round(float(unet_rate), 3),
        "unit": "grids/s (64^3x768 CLIP -> 8-class + 3-channel material fields)",
        "vs_baseline": round(float(unet_rate) / baseline_grids_per_sec, 3),
    }
    if mpm_rate is not None:
        out["aux_mpm_substeps_per_sec"] = round(float(mpm_rate), 1)
        out["aux_mpm_particles"] = mpm_particles
    print(json.dumps(out))


if __name__ == "__main__":
    main()
