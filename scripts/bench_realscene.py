"""BASELINE config #5: real-scene-scale multi-material MPM rollout bench.

Synthesizes a 500k-particle scene with three material regions (sand /
snow / plasticine), runs the fast solver at the real-scene grid settings
(n_grid=120, grid_lim=3.0, from config/real_scene/custom_bonsai_config.json;
reference third_party/PhysGaussian/config/real_scene), and writes the
reference-style ``sim_info.json`` timing block (reference
gs_simulation.py writes the same fields after a rollout).

Run:  python scripts/bench_realscene.py [--particles 500000] [--frames 5]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.sim.solver_fast import FastMPMSolver
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state


def build_scene(n: int, seed: int = 0):
    """Three material blobs resting above the ground plane of a grid_lim=3
    domain: a sand mound, a snow ball, and a plasticine slab."""
    rng = np.random.default_rng(seed)
    n_sand = n // 2
    n_snow = n // 4
    n_plas = n - n_sand - n_snow

    sand = rng.uniform([0.8, 0.8, 0.25], [1.6, 1.6, 0.75], (n_sand, 3))
    theta = rng.normal(size=(n_snow, 3))
    theta /= np.linalg.norm(theta, axis=1, keepdims=True)
    r = 0.35 * rng.uniform(0, 1, (n_snow, 1)) ** (1 / 3)
    snow = np.array([1.9, 1.2, 1.1]) + theta * r
    plas = rng.uniform([0.7, 1.8, 0.25], [2.1, 2.4, 0.55], (n_plas, 3))

    x = np.concatenate([sand, snow, plas]).astype(np.float32)
    material = np.concatenate([
        np.full(n_sand, 2, np.int32),   # sand (Drucker-Prager)
        np.full(n_snow, 5, np.int32),   # snow
        np.full(n_plas, 3, np.int32),   # plasticine (von Mises visplas)
    ])
    E = np.concatenate([
        np.full(n_sand, 5e7, np.float32),
        np.full(n_snow, 1e5, np.float32),
        np.full(n_plas, 2e6, np.float32),
    ])
    nu = np.concatenate([
        np.full(n_sand, 0.3, np.float32),
        np.full(n_snow, 0.2, np.float32),
        np.full(n_plas, 0.35, np.float32),
    ])
    density = np.concatenate([
        np.full(n_sand, 2000.0, np.float32),
        np.full(n_snow, 400.0, np.float32),
        np.full(n_plas, 1500.0, np.float32),
    ])
    yield_stress = np.concatenate([
        np.zeros(n_sand, np.float32),
        np.zeros(n_snow, np.float32),
        np.full(n_plas, 3e4, np.float32),
    ])
    vol = np.full(n, (3.0 ** 3) * 0.15 / n, np.float32)
    return x, vol, density, E, nu, material, yield_stress


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=500_000)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--out", default="/tmp/bench_realscene")
    args = ap.parse_args()

    cfg = MPMConfig(n_grid=120, grid_lim=3.0, gravity=(0.0, 0.0, -9.8),
                    grid_v_damping_scale=0.9999, rpic_damping=0.0)
    x, vol, density, E, nu, material, ys = build_scene(args.particles)
    st = finalize_mu_lam(make_state(
        x, vol, density=density, E=E, nu=nu, material=material,
        yield_stress=ys,
    ))
    # handshake hygiene: dispatch the async tunnel warm now (hides behind
    # the multi-minute frame-0 compile), join before the timed loop so the
    # first resort's base-cell fetch never eats a 60+ s stall
    from pixie_tpu.utils.device import warm_dispatch, warm_transfer
    warm_dispatch()
    solver = FastMPMSolver(st, cfg)

    substep_dt = 1e-4
    frame_dt = 4e-2  # 400 substeps/frame, bonsai config timing
    n_sub = int(round(frame_dt / substep_dt))

    print(f"{args.particles} particles, n_grid={cfg.n_grid}, "
          f"{n_sub} substeps/frame, {args.frames} frames", flush=True)

    t0 = time.perf_counter()
    solver.step_frame(n_sub, substep_dt)
    jax.block_until_ready(solver._padded.x)
    compile_s = time.perf_counter() - t0
    print(f"frame 0 (compile+run): {compile_s:.1f}s "
          f"(warm join {warm_transfer():.2f}s)", flush=True)

    frame_times = []
    for f in range(args.frames):
        t0 = time.perf_counter()
        solver.step_frame(n_sub, substep_dt)
        jax.block_until_ready(solver._padded.x)
        frame_times.append(time.perf_counter() - t0)
        print(f"frame {f + 1}: {frame_times[-1]:.3f}s "
              f"({n_sub / frame_times[-1]:.1f} substeps/s)", flush=True)

    xs = np.asarray(solver.state.x)
    assert np.isfinite(xs).all(), "non-finite particle positions"
    med = float(np.median(frame_times))
    rs = dict(solver.resort_stats)
    print(f"resort stats: { {k: round(v, 3) if isinstance(v, float) else v for k, v in rs.items()} }",
          flush=True)
    info = {
        "resort_stats": {k: round(v, 4) if isinstance(v, float) else v
                         for k, v in rs.items()},
        "n_particles": int(args.particles),
        "n_grid": cfg.n_grid,
        "grid_lim": cfg.grid_lim,
        "materials": {"sand": 2, "snow": 5, "plasticine": 3},
        "substep_dt": substep_dt,
        "frame_dt": frame_dt,
        "substeps_per_frame": n_sub,
        "frames_timed": args.frames,
        "compile_plus_first_frame_s": compile_s,
        "median_frame_s": med,
        "substeps_per_s": n_sub / med,
        "particle_substeps_per_s": args.particles * n_sub / med,
        "device": str(jax.devices()[0]),
    }
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "sim_info.json").write_text(json.dumps(info, indent=2))
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
