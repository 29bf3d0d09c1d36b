"""Minimal rollout demo: an elastic jelly block dropped onto a pinned ground.

Usage:  python examples/jelly_drop.py [--particles 10000] [--frames 10] [--out DIR]

Mirrors the reference's sim driver flow (gs_simulation.py:377-641) on a
synthetic block: build state -> set materials -> ground BC -> frame loop of
substeps -> export particle PLY per frame.
"""

import argparse
import time
from pathlib import Path

import numpy as np

from pixie_tpu.sim.solver import MPMSolver
from pixie_tpu.utils.io import make_material_vertex, write_ply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=10000)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--substeps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=1e-4)
    ap.add_argument("--out", type=str, default="/tmp/jelly_drop")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fast", action="store_true",
                    help="use the Pallas tile-blocked solver")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    x = rng.uniform(0.75, 1.25, (args.particles, 3)).astype(np.float32)
    x[:, 2] += 0.3  # hover above the ground
    vol = np.full(args.particles, (0.5**3) / args.particles, np.float32)

    solver = MPMSolver()
    solver.load_initial_data(x, vol, n_grid=50, grid_lim=2.0)
    solver.set_parameters_dict(
        {
            "material": "jelly",
            "E": 2e5,
            "nu": 0.4,
            "density": 200.0,
            "g": [0.0, 0.0, -9.8],
        }
    )
    solver.finalize_mu_lam()
    # thin pinned ground slab like fix_to_ground (material_field.py:485-545)
    solver.set_velocity_on_cuboid(
        point=[1.0, 1.0, 0.5], size=[1.0, 1.0, 0.025],
        velocity=[0.0, 0.0, 0.0], start_time=0.0, end_time=1e9, reset=1,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.fast:
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        stepper = FastMPMSolver(solver.state, solver.cfg, tuple(solver.bcs))
    else:
        stepper = solver

    # warm-up / compile
    t0 = time.time()
    stepper.step_frame(args.substeps, args.dt)
    np.asarray(stepper.state.x)
    compile_s = time.time() - t0
    print(f"frame 0 (incl. compile): {compile_s:.2f}s")

    times = []
    for frame in range(1, args.frames):
        t0 = time.time()
        stepper.step_frame(args.substeps, args.dt)
        pos = np.asarray(stepper.state.x)
        times.append(time.time() - t0)
        v = make_material_vertex(
            coords=pos,
            density=np.asarray(stepper.state.density),
            E=np.asarray(stepper.state.E),
            nu=np.asarray(stepper.state.nu),
            material_id=np.asarray(stepper.state.material),
        )
        write_ply(out_dir / f"frame_{frame:04d}.ply", v)
        print(
            f"frame {frame}: {times[-1]*1e3:.1f}ms "
            f"({args.substeps/times[-1]:.0f} substeps/s), "
            f"z range [{pos[:,2].min():.3f}, {pos[:,2].max():.3f}]"
        )

    if times:
        med = float(np.median(times))
        print(
            f"\nmedian frame: {med*1e3:.1f}ms = {args.substeps/med:.0f} substeps/s "
            f"@ {args.particles} particles"
        )


if __name__ == "__main__":
    main()
