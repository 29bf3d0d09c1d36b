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


def bench_realscene(n_particles: int = 500_000, frames: int = 3):
    """BASELINE config #5 at bench scale: 500k-particle sand/snow/plasticine
    scene, n_grid=120 / grid_lim=3.0, 400 substeps/frame (reference
    config/real_scene/custom_bonsai_config.json timing scheme).  Same shapes
    as scripts/bench_realscene.py so the compile caches alias.

    Returns (substeps_per_s, n_particles)."""
    import jax
    import jax.numpy as jnp

    from pixie_tpu.sim.solver_fast import FastMPMSolver
    from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    from bench_realscene import build_scene

    x, vol, density, E, nu, material, ys = build_scene(n_particles)
    st = finalize_mu_lam(make_state(
        x, vol, density=density, E=E, nu=nu, material=material,
        yield_stress=ys))
    cfg = MPMConfig(n_grid=120, grid_lim=3.0, gravity=(0.0, 0.0, -9.8),
                    grid_v_damping_scale=0.9999, rpic_damping=0.0)
    solver = FastMPMSolver(st, cfg)
    n_sub = 400

    def force():
        return float(jnp.sum(solver._padded.x))

    t0 = time.time()
    solver.step_frame(n_sub, 1e-4)
    force()
    log(f"realscene compile+first: {time.time()-t0:.1f}s")
    # warm-up: absorb residual-async / resort-recompile outliers (ADVICE r3)
    for _ in range(2):
        solver.step_frame(n_sub, 1e-4)
        force()
    times = []
    for _ in range(max(frames, 3)):
        t0 = time.time()
        solver.step_frame(n_sub, 1e-4)
        force()
        times.append(time.time() - t0)
    rate = n_sub / float(np.median(times))
    log(f"realscene: {rate:.1f} substeps/s @ {n_particles} particles, "
        f"n_grid=120 (median of {len(times)} frames)")
    return rate, n_particles


def bench_render_sim(n_gaussians: int = 100_000, res: int = 800,
                     frames: int = 4):
    """In-loop GS sim-render cost (the reference's flagship output path,
    gs_simulation.py:573-631).  Same shapes as scripts/bench_render_sim.py
    so compile caches alias.  Returns median ms/frame with device-resident
    inputs (the production driver feeds solver-state device arrays)."""
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from pixie_tpu.sim.render_sim import SimRenderer

    rng = np.random.default_rng(0)
    x_mpm = rng.uniform(0.8, 1.2, (n_gaussians, 3)).astype(np.float32)
    s = rng.uniform(0.002, 0.008, (n_gaussians, 3)).astype(np.float32)
    cov6 = np.stack([s[:, 0] ** 2, 0 * s[:, 0], 0 * s[:, 0],
                     s[:, 1] ** 2, 0 * s[:, 0], s[:, 2] ** 2], -1)
    shs = rng.normal(0, 0.3, (n_gaussians, 16, 3)).astype(np.float32)
    shs[:, 0] += 1.0
    opacity = rng.uniform(0.3, 0.95, (n_gaussians, 1)).astype(np.float32)
    camera_params = {
        "mpm_space_viewpoint_center": [1.0, 1.0, 1.0],
        "mpm_space_vertical_upward_axis": [0.0, 0.0, 1.0],
        "default_camera_index": -1, "init_azimuthm": 0.0,
        "init_elevation": 20.0, "init_radius": 2.2, "move_camera": True,
        "delta_a": 1.0, "delta_e": 0.0, "delta_r": 0.0,
    }
    renderer = SimRenderer.from_camera_params(
        camera_params, model_path=None, n_frames=frames + 2,
        shs=shs, opacity_act=opacity, scale_origin=0.5,
        original_mean_pos=np.zeros(3, np.float32), rotation_matrices=[],
        z_shift=0.0)
    renderer.width = renderer.height = res
    t0 = time.time()
    renderer.render_frame(0, x_mpm, cov6)
    log(f"render-sim compile+first: {time.time()-t0:.1f}s")
    staged = [jax.device_put(x_mpm + np.float32(0.002 * f))
              for f in range(1, frames + 1)]
    cov_dev = jax.device_put(cov6)
    times = []
    for f, xf in enumerate(staged, start=1):
        t0 = time.time()
        renderer.render_frame(f, xf, cov_dev)
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1e3
    log(f"render-sim: {ms:.1f} ms/frame @ {n_gaussians} gaussians, {res}^2")
    return ms


def bench_field(quick: bool):
    """Voxelizer query + f3rm train step (VERDICT r2 #3: the previously
    unbenchmarked stages).  Reference: voxelize.py:17-141,
    feature_field.py:71-82."""
    import jax
    import jax.numpy as jnp
    import optax

    from pixie_tpu.recon.field import (
        FeatureField,
        NerfField,
        ProposalField,
        RenderConfig,
        render_rays_prop,
    )

    side = 16 if quick else 64
    rays = 256 if quick else 4096
    rcfg = (RenderConfig(n_coarse=16, n_fine=8) if quick
            else RenderConfig(n_coarse=64, n_fine=32))
    reps = 2 if quick else 3

    nerf, feat, prop = NerfField(), FeatureField(), ProposalField()
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    params = {
        "nerf": nerf.init(rng, dummy, jnp.zeros((8, 3)), False),
        "feat": feat.init(jax.random.fold_in(rng, 7), dummy),
        "prop": prop.init(jax.random.fold_in(rng, 13), dummy),
    }

    @jax.jit
    def query(p, pts):
        return nerf.apply(p["nerf"], pts, None, True), \
            feat.apply(p["feat"], pts)

    grid = np.stack(
        np.meshgrid(*[np.linspace(0, 1, side, dtype=np.float32)] * 3,
                    indexing="ij"), axis=-1,
    ).reshape(-1, 3)
    t0 = time.time()
    d, _ = query(params, jnp.asarray(grid))
    float(jnp.sum(d))
    log(f"voxel query compile+first: {time.time()-t0:.1f}s")
    times = []
    for r in range(reps):
        t0 = time.time()
        d, _ = query(params, jnp.asarray(grid) + np.float32(1e-4 * (r + 1)))
        float(jnp.sum(d))
        times.append(time.time() - t0)
    query_ms = float(np.median(times)) * 1e3
    log(f"voxel query: {query_ms:.1f} ms for {side}^3")

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    napply = lambda p, pts, dirs, do: nerf.apply(p, pts, dirs, do)
    fapply = lambda p, pts: feat.apply(p, pts)
    papply = lambda p, pts: prop.apply(p, pts)

    @jax.jit
    def step(params, opt_state, rng):
        k1, k2 = jax.random.split(rng)
        origins = jax.random.uniform(k1, (rays, 3), minval=-1.0, maxval=1.0)
        dirs = jax.random.normal(k2, (rays, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def loss_fn(p):
            out = render_rays_prop(
                papply, napply, fapply, p["prop"], p["nerf"], p["feat"],
                origins, dirs, k2, rcfg, train=True, with_features=True,
            )
            return (jnp.mean(out["rgb"] ** 2) + out["prop_loss"]
                    + 1e-3 * jnp.mean(out["feature"] ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, 1))
    float(loss)
    log(f"field step compile+first: {time.time()-t0:.1f}s")
    times = []
    for r in range(reps):
        t0 = time.time()
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(rng, 100 + r))
        float(loss)
        times.append(time.time() - t0)
    step_ms = float(np.median(times)) * 1e3
    log(f"field step: {step_ms:.1f} ms @ {rays} rays")
    return query_ms, step_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes, CPU-safe")
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--skip-mpm", action="store_true")
    ap.add_argument("--skip-field", action="store_true")
    ap.add_argument("--skip-realscene", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    # pay the remote tunnel's ~60 s first-fetch handshake once, up front,
    # so it doesn't land inside (and skew) a stage timing (utils/device.py)
    from pixie_tpu.utils.device import warm_transfer
    warm_transfer()

    # Stage fault isolation (VERDICT r3 weak #1: an un-isolated realscene
    # compile crash zeroed the whole BENCH_r03 contract).  Each stage runs
    # under guard(); a failing stage records its error and the JSON line is
    # ALWAYS printed with whatever succeeded.
    errors = {}

    def guard(name, fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 — bench must never die mid-run
            import traceback

            errors[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            log(f"STAGE FAILED [{name}]: {errors[name]}")
            traceback.print_exc(file=sys.stderr)
            return None

    if args.quick:
        mpm_particles = 2000
        unet_rate = guard("unet", bench_unet, batch=1, iters=2, grid=16,
                          feat_ch=64)
        mpm_rate = None if args.skip_mpm else guard(
            "mpm", bench_mpm, mpm_particles, 20, 2, fast=False)
    else:
        mpm_particles = args.particles
        unet_rate = guard("unet", bench_unet, batch=args.batch, iters=10)
        mpm_rate = None if args.skip_mpm else guard(
            "mpm", bench_mpm, mpm_particles, 100, 5)

    field_ms = None if args.skip_field else guard("field", bench_field,
                                                  args.quick)
    rs = (None if (args.quick or args.skip_realscene or args.skip_mpm)
          else guard("realscene", bench_realscene))
    render_ms = (None if (args.quick or args.skip_render)
                 else guard("render_sim", bench_render_sim))

    if mpm_rate is not None:
        log(f"aux: mpm_substeps_per_s={mpm_rate:.1f}")

    # Reference baseline: no published numbers exist (BASELINE.md); ratio is
    # against a 10 grids/s placeholder until the driver measures the
    # reference's inference_combined on its own hardware.
    baseline_grids_per_sec = 10.0
    out = {
        "metric": "unet_voxel_grids_per_sec",
        "value": round(float(unet_rate), 3) if unet_rate is not None else None,
        "unit": "grids/s (64^3x768 CLIP -> 8-class + 3-channel material fields)",
        "vs_baseline": (round(float(unet_rate) / baseline_grids_per_sec, 3)
                        if unet_rate is not None else None),
    }
    if mpm_rate is not None:
        out["aux_mpm_substeps_per_sec"] = round(float(mpm_rate), 1)
        out["aux_mpm_particles"] = mpm_particles
    if field_ms is not None:
        out["aux_voxel_query_ms"] = round(field_ms[0], 1)
        out["aux_field_step_ms"] = round(field_ms[1], 1)
    if rs is not None:
        out["aux_realscene_substeps_per_sec"] = round(float(rs[0]), 1)
        out["aux_realscene_particles"] = rs[1]
    if render_ms is not None:
        out["aux_render_sim_ms_per_frame"] = round(float(render_ms), 1)
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
