"""MPM fast-path probes: bf16 transfer dots + profiler breakdown."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.ops import transfer
from pixie_tpu.sim.solver_fast import FastMPMSolver
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

N, SUBSTEPS, REPS = 100_000, 100, 5


def build():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.75, 1.25, (N, 3)).astype(np.float32)
    st = finalize_mu_lam(
        make_state(x, np.full(N, 1e-6, np.float32), density=200.0, E=2e5, nu=0.4))
    cfg = MPMConfig(n_grid=50, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
    return FastMPMSolver(st, cfg)


def run(label, trace=False):
    solver = build()

    def force():
        return float(jnp.sum(solver._padded.x))

    t0 = time.time()
    solver.step_frame(SUBSTEPS, 1e-4)
    force()
    print(f"{label} compile+first: {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        solver.step_frame(SUBSTEPS, 1e-4)
        force()
    times = []
    for _ in range(REPS):
        t0 = time.time()
        solver.step_frame(SUBSTEPS, 1e-4)
        force()
        times.append(time.time() - t0)
    rate = SUBSTEPS / float(np.median(times))
    print(f"{label}: {rate:.1f} substeps/s "
          f"({np.median(times)/SUBSTEPS*1e3:.2f} ms/substep)", flush=True)
    if trace:
        with jax.profiler.trace("/tmp/mpm_trace"):
            solver.step_frame(SUBSTEPS, 1e-4)
            force()
        print("trace -> /tmp/mpm_trace", flush=True)


def main():
    run("fp32 dots", trace=True)
    transfer.BF16_DOTS = True
    run("bf16 dots")


if __name__ == "__main__":
    main()
