"""Golden rollouts: the vectorized JAX solver vs the scalar NumPy oracle
(tests/oracle_mpm.py, a per-particle transliteration of the reference Warp
kernel semantics, mpm_utils.py:282-527).

The oracle runs in float64 with naive loops; the solver runs fp32 vectorized.
Agreement within fp32 drift over tens of substeps validates the vectorized
weights/scatter/gather/return-mapping implementations end to end — the leg of
the test pyramid SURVEY.md section 4 calls for.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oracle_mpm import OracleParams, make_oracle_state, substep
from pixie_tpu.sim.solver import simulate_substeps
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state


def _run_pair(x, vol, n_substeps, dt=1e-4, material=0, E=1e5, nu=0.3,
              density=200.0, yield_stress=0.0, gravity=(0.0, 0.0, -9.8),
              update_cov=False, cov=None, **cfg_kw):
    mats = np.unique(np.atleast_1d(material)).tolist()
    cfg = MPMConfig(n_grid=16, grid_lim=2.0, gravity=gravity,
                    update_cov_with_F=update_cov,
                    active_materials=tuple(int(m) for m in mats), **cfg_kw)
    vol = np.full(len(x), vol, np.float32) if np.ndim(vol) == 0 else vol
    st = finalize_mu_lam(make_state(
        x, vol, density=density, E=E, nu=nu, material=material,
        yield_stress=yield_stress, init_cov=cov,
    ))
    out = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(dt),
                            n_substeps)

    prm = OracleParams(n_grid=16, grid_lim=2.0, gravity=gravity,
                       update_cov_with_F=update_cov,
                       **{k: v for k, v in cfg_kw.items()
                          if k in ("rpic_damping", "grid_v_damping_scale",
                                   "hardening", "xi", "friction_angle",
                                   "plastic_viscosity", "softening")})
    ost = make_oracle_state(x, vol, density=density, E=E, nu=nu,
                            material=material, yield_stress=yield_stress,
                            cov=cov)
    for _ in range(n_substeps):
        substep(ost, prm, dt)
    return out, ost


def _block(rng, n=64, center=(1.0, 1.0, 1.2), half=0.15):
    return (np.asarray(center)
            + rng.uniform(-half, half, (n, 3))).astype(np.float32)


class TestGoldenRollouts:
    def test_jelly_block_drop(self):
        """Jelly block under gravity: x, v, F, C match the oracle."""
        rng = np.random.default_rng(0)
        x = _block(rng)
        out, ost = _run_pair(x, 1e-6, n_substeps=50, E=2e5, nu=0.4)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v), ost["v"], atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.F), ost["F"], atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.C), ost["C"], atol=2e-2)

    def test_sand_drop(self):
        rng = np.random.default_rng(1)
        x = _block(rng)
        out, ost = _run_pair(x, 1e-6, n_substeps=40, material=2, E=5e5,
                             nu=0.3, density=1000.0)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v), ost["v"], atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.F), ost["F"], atol=5e-4)

    def test_metal_von_mises(self):
        rng = np.random.default_rng(2)
        x = _block(rng, half=0.1)
        out, ost = _run_pair(x, 1e-6, n_substeps=40, material=1, E=1e6,
                             nu=0.3, density=2000.0, yield_stress=1e3)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.F), ost["F"], atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.yield_stress),
                                   ost["yield_stress"], rtol=1e-4)

    def test_snow_with_damage(self):
        rng = np.random.default_rng(3)
        x = _block(rng)
        out, ost = _run_pair(x, 1e-6, n_substeps=40, material=5, E=2e5,
                             nu=0.3, density=400.0, yield_stress=5e2,
                             softening=0.1)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.F), ost["F"], atol=5e-4)

    def test_mixed_materials_one_scene(self):
        """jelly + sand + metal + snow + the material-6 water quirk together."""
        rng = np.random.default_rng(4)
        x = _block(rng, n=80, half=0.2)
        material = np.array(([0] * 16 + [1] * 16 + [2] * 16 + [5] * 16
                             + [6] * 16), np.int32)
        out, ost = _run_pair(x, 1e-6, n_substeps=30, material=material,
                             E=3e5, nu=0.3, density=500.0, yield_stress=1e3)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v), ost["v"], atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.F), ost["F"], atol=5e-4)

    def test_rpic_damping_and_grid_damping(self):
        rng = np.random.default_rng(5)
        x = _block(rng)
        out, ost = _run_pair(x, 1e-6, n_substeps=30, E=2e5, nu=0.35,
                             rpic_damping=0.5, grid_v_damping_scale=0.9999)
        np.testing.assert_allclose(np.asarray(out.x), ost["x"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v), ost["v"], atol=2e-3)

    def test_cov_transport(self):
        rng = np.random.default_rng(6)
        x = _block(rng)
        cov = np.tile(np.array([1e-4, 0, 0, 1e-4, 0, 1e-4]), (len(x), 1))
        out, ost = _run_pair(x, 1e-6, n_substeps=30, E=2e5, nu=0.4,
                             update_cov=True, cov=cov)
        np.testing.assert_allclose(np.asarray(out.cov), ost["cov"],
                                   rtol=1e-3, atol=1e-9)

    def test_fast_solver_matches_oracle(self):
        """The tile-blocked Pallas fast path (interpret mode on CPU) tracks
        the oracle too, not just the linear path."""
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        rng = np.random.default_rng(7)
        x = _block(rng, n=96)
        cfg = MPMConfig(n_grid=16, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        st = finalize_mu_lam(make_state(x, np.full(96, 1e-6, np.float32),
                                        density=200.0, E=2e5, nu=0.4))
        solver = FastMPMSolver(st, cfg)
        n_sub, dt = 30, 1e-4
        solver.step_frame(n_sub, dt)
        got = np.asarray(solver.state.x)

        prm = OracleParams(n_grid=16, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
        ost = make_oracle_state(x, 1e-6, density=200.0, E=2e5, nu=0.4)
        for _ in range(n_sub):
            substep(ost, prm, dt)
        np.testing.assert_allclose(got, ost["x"], atol=5e-5)
