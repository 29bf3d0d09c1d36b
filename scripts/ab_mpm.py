"""One-combo MPM timing run for the r3 env-flag A/B (fused / slab / box).

Launch a fresh process per combo (SLAB is read at ``pixie_tpu.ops.tiling``
import time): ``PIXIE_FUSED=.. PIXIE_SLAB=.. PIXIE_BOX=.. python
scripts/ab_mpm.py --label name``.  Prints one summary line per run;
aggregate the log into docs/DESIGN.md.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.sim.solver_fast import FastMPMSolver
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="ab")
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--n-grid", type=int, default=50)
    ap.add_argument("--substeps", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = rng.uniform(0.75, 1.25, (args.particles, 3)).astype(np.float32)
    st = finalize_mu_lam(make_state(
        x, np.full(args.particles, 1e-6, np.float32),
        density=200.0, E=2e5, nu=0.4))
    cfg = MPMConfig(n_grid=args.n_grid, grid_lim=2.0,
                    gravity=(0.0, 0.0, -9.8))
    solver = FastMPMSolver(st, cfg)

    def force():
        return float(jnp.sum(solver._padded.x))

    t0 = time.perf_counter()
    solver.step_frame(args.substeps, 1e-4)
    force()
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        solver.step_frame(args.substeps, 1e-4)
        force()
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        solver.step_frame(args.substeps, 1e-4)
        force()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    flags = {k: os.environ.get(k, "<default>")
             for k in ("PIXIE_FUSED", "PIXIE_SLAB", "PIXIE_BOX", "PIXIE_TILE")}
    print(f"AB {args.label}: {args.substeps / med:.1f} substeps/s "
          f"({med / args.substeps * 1e3:.2f} ms/substep) "
          f"compile+first={compile_s:.1f}s flags={flags} "
          f"n={args.particles} n_grid={args.n_grid} "
          f"device={jax.devices()[0]}", flush=True)


if __name__ == "__main__":
    main()
