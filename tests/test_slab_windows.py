"""Slab-window mode (PIXIE_SLAB=1): z-axis sub-tiling parity tests.

The slabbed layout (ops/tiling.py SLAB/NSLAB/ZWIN_S) shrinks the transfer
kernels' (y,z) pair maps from 16x16 to 16x8 columns — one MXU N-pass per
contraction instead of two (docs/DESIGN.md "MPM fast-path architecture").
Module constants are bound at import, so the slabbed configuration runs in
a subprocess with the env set; this file asserts rollout parity of both
fast paths (two-kernel and fused) against the reference XLA solver, plus
the layout invariants, matching the default-mode tests in
tests/test_fast_solver.py.  Reference semantics: mpm_utils.py:338-463.
"""

import os
import subprocess
import sys
import textwrap

import pytest


_CPU_PIN = (
    # JAX_PLATFORMS env is ignored on this box (sitecustomize pins the axon
    # TPU plugin, docs/DESIGN.md); pin CPU via config before anything else.
    "import jax\n"
    "jax.config.update('jax_platforms', 'cpu')\n"
)


def _run_slabbed(code: str) -> str:
    env = dict(os.environ, PIXIE_SLAB="1")
    out = subprocess.run(
        [sys.executable, "-c", _CPU_PIN + textwrap.dedent(code)],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_slab_constants_and_layout():
    out = _run_slabbed("""
        import numpy as np
        from pixie_tpu.ops import tiling

        assert tiling.NSLAB > 1 and tiling.SLAB == 4
        assert tiling.ZWIN_S == 8 and tiling.PAIRW == tiling.WIN_S * 8

        rng = np.random.default_rng(3)
        x = rng.uniform(0.3, 1.7, (5000, 3)).astype(np.float32)
        n_grid, inv_dx = 50, 25.0
        lay = tiling.build_padded_layout(x, n_grid, inv_dx)
        bt = np.asarray(lay["block_tile"])
        tc = np.asarray(lay["tile_coords"])
        perm = np.asarray(lay["perm"])
        occ = np.asarray(lay["occupied"]) > 0
        t = tiling.n_tiles(n_grid)
        # sub-tile ids cover [0, t^3*NSLAB); coords decode consistently
        assert bt.max() < t ** 3 * tiling.NSLAB
        assert (tc[:, 2] == (bt % t if tiling.NSLAB == 1 else
                             ((bt // tiling.NSLAB) % t) * tiling.NSLAB
                             + bt % tiling.NSLAB)).all()
        # every occupied slot's particle lies in its block's sub-tile window
        base = np.floor(x * inv_dx - 0.5).astype(np.int32)
        slot_tc = np.repeat(tc, tiling.PBLK, axis=0)
        origin = slot_tc * np.asarray(tiling.ORIGIN)
        u0 = base[perm] - origin + 1
        hi = np.asarray(tiling.U0_HI)
        assert ((u0[occ] >= 0) & (u0[occ] <= hi)).all()
        print("LAYOUT_OK")
    """)
    assert "LAYOUT_OK" in out


def test_slab_fold_roundtrip():
    """combine_windows_mm o extract_windows_mm == identity on the interior
    (adjoint pair on the blocked grid)."""
    out = _run_slabbed("""
        import numpy as np
        import jax.numpy as jnp
        from pixie_tpu.ops import tiling

        t, n_ch = 3, 4
        rng = np.random.default_rng(0)
        g = rng.normal(size=(t, t, t, n_ch, tiling.TILE, tiling.TILE,
                             tiling.TILE)).astype(np.float32)
        wins = tiling.extract_windows_mm(jnp.asarray(g))
        assert wins.shape == (t ** 3 * tiling.NSLAB,
                              n_ch * tiling.WIN_S,
                              tiling.WIN_S * tiling.ZWIN_S), wins.shape
        # adjoint identity: <extract(g), w> == <g, combine(w)>
        w = rng.normal(size=wins.shape).astype(np.float32)
        lhs = float(jnp.sum(wins * w))
        rhs = float(jnp.sum(jnp.asarray(g)
                            * tiling.combine_windows_mm(jnp.asarray(w), t,
                                                        n_ch)))
        assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs)), (lhs, rhs)
        print("FOLD_OK")
    """)
    assert "FOLD_OK" in out


@pytest.mark.parametrize("fused", ["0", "1"])
def test_slab_rollout_parity(fused):
    """30-substep rollout parity vs the reference XLA solver (the same
    harness as tests/test_fast_solver.py, in the slabbed configuration)."""
    out = _run_slabbed(f"""
        import os
        os.environ["PIXIE_FUSED"] = "{fused}"
        import numpy as np
        import jax.numpy as jnp
        from pixie_tpu.sim.solver import simulate_substeps
        from pixie_tpu.sim.solver_fast import FastMPMSolver
        from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

        rng = np.random.default_rng(0)
        n = 3000
        x = rng.uniform(0.7, 1.3, (n, 3)).astype(np.float32)
        st = finalize_mu_lam(make_state(
            x, np.full(n, 1e-6, np.float32), density=200.0, E=2e5, nu=0.4))
        cfg = MPMConfig(n_grid=50, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
        nsub = 30
        ref = simulate_substeps(st, cfg, (), jnp.float32(0.0),
                                jnp.float32(1e-4), nsub)
        solver = FastMPMSolver(st, cfg)
        solver.step_frame(nsub, 1e-4)
        got = solver.state
        loose = "{fused}" == "1"  # in-kernel stress amplifies last-ulp noise
        # C scales with 4*inv_dx (~100x velocity), so its absolute band is
        # wider (measured 7.8e-5 two-kernel / CPU interpret)
        tols = {{"x": 1e-5, "v": 1e-5, "F_trial": 1e-5, "C": 1e-3}}
        for f in ("x", "v", "F_trial", "C"):
            d = float(np.max(np.abs(np.asarray(getattr(ref, f))
                                    - np.asarray(getattr(got, f)))))
            assert d < tols[f] * (20.0 if loose else 1.0), (f, d)
        print("PARITY_OK")
    """)
    assert "PARITY_OK" in out
