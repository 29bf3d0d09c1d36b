"""TPU compile-smoke harness: AOT-compile every Pallas-bearing program at
PRODUCTION shapes without running a single frame.

Round-3 lesson (VERDICT r3 weak #1): interpret-mode CPU tests structurally
cannot catch Mosaic/SMEM compile rejections — the default fused path shipped
an SMEM overflow at n_grid=120 that crashed every real-scene config and
zeroed BENCH_r03.  This script catches that failure class in minutes:
``jit_fn.lower(args).compile()`` exercises the full remote Mosaic/XLA TPU
compile (chipless AOT) for each production shape.

Because each entry uses the EXACT shapes of its bench script, a green smoke
run also pre-warms the persistent compilation cache for bench.py.

Run on the TPU runtime (NOT under tests/conftest.py's CPU pin):

    python scripts/compile_smoke.py [--only mpm100k-fused,...] [--list]

Exit code = number of failed entries.  One status line per entry.
"""

import argparse
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _solver(n_particles, cfg, use_box, seed=0, realscene=False):
    import jax.numpy as jnp  # noqa: F401  (keeps jax import after env setup)

    from pixie_tpu.sim.solver_fast import FastMPMSolver
    from pixie_tpu.sim.types import finalize_mu_lam, make_state

    if realscene:
        from bench_realscene import build_scene

        x, vol, density, E, nu, material, ys = build_scene(n_particles)
        st = finalize_mu_lam(make_state(
            x, vol, density=density, E=E, nu=nu, material=material,
            yield_stress=ys))
    else:
        rng = np.random.default_rng(seed)
        x = rng.uniform(0.75, 1.25, (n_particles, 3)).astype(np.float32)
        st = finalize_mu_lam(make_state(
            x, np.full(n_particles, 1e-6, np.float32), density=200.0,
            E=2e5, nu=0.4))
    solver = FastMPMSolver(st, cfg, interpret=False)
    solver.use_box = use_box
    solver._resort()
    return solver


def _lower_mpm(solver, fused: bool, n_substeps: int, dt: float):
    import jax.numpy as jnp

    from pixie_tpu.sim.solver_fast import (
        simulate_substeps_fast,
        simulate_substeps_fused,
    )

    lay = solver._layout
    if solver.use_box:
        box_dims = tuple(lay["box_tiles"])
        box_org = jnp.asarray(lay["box_origin"], jnp.int32)
    else:
        box_dims, box_org = None, None
    fn = simulate_substeps_fused if fused else simulate_substeps_fast
    t0 = jnp.float32(0.0)
    dt_arg = float(dt) if fused else jnp.float32(dt)
    return fn.lower(
        solver._padded, lay["block_tile"], lay["tile_coords"],
        lay["occupied"], solver.cfg, (), t0, dt_arg, n_substeps,
        lay["n_blocks"], interpret=False, box_dims=box_dims, box_org=box_org,
    )


def make_entries():
    """name -> zero-arg callable returning a jax Lowered object."""
    from pixie_tpu.sim.types import MPMConfig

    cfg50 = MPMConfig(n_grid=50, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
    cfg120 = MPMConfig(n_grid=120, grid_lim=3.0, gravity=(0.0, 0.0, -9.8),
                       grid_v_damping_scale=0.9999, rpic_damping=0.0)

    entries = {}

    def mpm(name, n, cfg, fused, box, n_sub, realscene=False):
        def build():
            s = _solver(n, cfg, use_box=box, realscene=realscene)
            return _lower_mpm(s, fused=fused, n_substeps=n_sub, dt=1e-4)
        entries[name] = build

    # bench.py bench_mpm shape (100k, n_grid=50, 100 substeps)
    mpm("mpm100k-fused", 100_000, cfg50, fused=True, box=True, n_sub=100)
    mpm("mpm100k-2kernel", 100_000, cfg50, fused=False, box=True, n_sub=100)
    # bench.py bench_realscene shape (500k, n_grid=120, 400 substeps)
    mpm("realscene-fused-box", 500_000, cfg120, fused=True, box=True,
        n_sub=400, realscene=True)
    mpm("realscene-fused-nobox", 500_000, cfg120, fused=True, box=False,
        n_sub=400, realscene=True)
    mpm("realscene-2kernel-box", 500_000, cfg120, fused=False, box=True,
        n_sub=400, realscene=True)

    def render():
        import jax

        from bench_render_sim import build_renderer

        renderer, cam = build_renderer(n_gaussians=100_000, resolution=800)
        return jax.jit(renderer._render_jit_target).lower(
            *renderer._render_args(cam))

    # registered lazily; scripts without a lowerable seam are skipped
    try:
        import bench_render_sim  # noqa: F401
        if hasattr(bench_render_sim, "build_renderer"):
            entries["render-sim-800"] = render
    except Exception:
        pass

    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated entry names (default: all)")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    entries = make_entries()
    if args.list:
        print("\n".join(entries))
        return 0

    names = [n for n in args.only.split(",") if n] or list(entries)
    failures = 0
    for name in names:
        if name not in entries:
            print(f"[SKIP] {name}: unknown entry", flush=True)
            continue
        t0 = time.time()
        try:
            lowered = entries[name]()
            lowered.compile()
            print(f"[PASS] {name}: compiled in {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            failures += 1
            msg = str(e).splitlines()
            head = msg[0] if msg else repr(e)
            print(f"[FAIL] {name} after {time.time()-t0:.1f}s: {head}",
                  flush=True)
            traceback.print_exc(limit=3)
    print(f"compile_smoke: {len(names)-failures}/{len(names)} passed",
          flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(main())
