"""Constitutive model semantics against the reference's closed forms."""

import jax.numpy as jnp
import numpy as np

from pixie_tpu.sim.constitutive import (
    compute_stress_from_F_trial,
    kirchhoff_stress_fcr,
    kirchhoff_stress_stvk,
    kirchhoff_stress_water,
    sand_return_mapping,
    von_mises_return_mapping,
)
from pixie_tpu.sim.svd3 import svd3
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state


def _eye_state(n=8, material=0, E=1e5, nu=0.3, ys=1e4):
    x = np.random.default_rng(0).uniform(0.5, 1.5, (n, 3)).astype(np.float32)
    st = make_state(x, np.full(n, 1e-6), material=material, E=E, nu=nu,
                    yield_stress=ys, bulk=1e5)
    return finalize_mu_lam(st)


def test_fcr_zero_at_identity():
    n = 4
    f = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)).astype(jnp.float32)
    u, s, v = svd3(f)
    mu = jnp.full((n,), 1e5)
    lam = jnp.full((n,), 1e5)
    stress = kirchhoff_stress_fcr(f, u, v, jnp.ones(n), mu, lam)
    np.testing.assert_allclose(np.asarray(stress), 0.0, atol=1e-2)


def test_stvk_zero_at_identity():
    n = 4
    f = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)).astype(jnp.float32)
    u, s, v = svd3(f)
    stress = kirchhoff_stress_stvk(f, u, v, s, jnp.full((n,), 1e5), jnp.full((n,), 1e5))
    np.testing.assert_allclose(np.asarray(stress), 0.0, atol=1e-1)


def test_fcr_uniaxial_sign():
    """Compression along z must produce negative tau_zz (restoring stress)."""
    n = 2
    f = jnp.broadcast_to(jnp.diag(jnp.array([1.0, 1.0, 0.8])), (n, 3, 3)).astype(jnp.float32)
    u, s, v = svd3(f)
    J = jnp.linalg.det(f)
    stress = kirchhoff_stress_fcr(f, u, v, J, jnp.full((n,), 1e5), jnp.full((n,), 0.0))
    assert float(stress[0, 2, 2]) < 0
    assert abs(float(stress[0, 0, 0])) < 1e-3


def test_water_pressure_sign():
    bulk = jnp.full((3,), 1e5)
    # compressed -> positive pressure -> positive diagonal? tau = J * (-bulk (J^-g -1)) I
    tau_c = kirchhoff_stress_water(jnp.full((3,), 0.9), bulk)
    tau_e = kirchhoff_stress_water(jnp.full((3,), 1.1), bulk)
    assert float(tau_c[0, 0, 0]) < 0  # compression resists: -bulk(J^-g - 1) < 0
    assert float(tau_e[0, 0, 0]) > 0


def test_von_mises_below_yield_is_identity_map():
    n = 4
    rng = np.random.default_rng(1)
    f = np.eye(3, dtype=np.float32) + 1e-4 * rng.normal(size=(n, 3, 3)).astype(np.float32)
    f = jnp.asarray(f)
    u, s, v = svd3(f)
    mu = jnp.full((n,), 1e5)
    lam = jnp.full((n,), 1e5)
    ys = jnp.full((n,), 1e9)  # huge yield stress: no plasticity
    f_out, ys_out = von_mises_return_mapping(f, u, s, v, mu, lam, ys, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(f_out), np.asarray(f), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ys_out), np.asarray(ys))


def test_von_mises_above_yield_reduces_deviatoric():
    n = 1
    f = jnp.asarray(np.diag([2.0, 0.5, 1.0]).astype(np.float32))[None]
    u, s, v = svd3(f)
    mu = jnp.full((n,), 1e5)
    lam = jnp.full((n,), 0.0)
    ys = jnp.full((n,), 1e3)
    f_out, _ = von_mises_return_mapping(f, u, s, v, mu, lam, ys, 0.0, 0.0)
    s_out = np.linalg.svd(np.asarray(f_out)[0], compute_uv=False)
    s_in = np.array([2.0, 1.0, 0.5])
    # plastic projection shrinks the spread of log-singular values
    assert np.std(np.log(s_out)) < np.std(np.log(s_in))


def test_sand_elastic_region_unchanged():
    """delta_gamma <= 0 (strong compression along all axes balanced) -> F unchanged."""
    n = 1
    f = jnp.asarray((np.eye(3) * 0.95).astype(np.float32))[None]  # tr < 0, small dev
    u, s, v = svd3(f)
    mu = jnp.full((n,), 1e5)
    lam = jnp.full((n,), 1e5)
    f_out = sand_return_mapping(f, u, s, v, mu, lam, alpha=0.3)
    np.testing.assert_allclose(np.asarray(f_out), np.asarray(f), atol=1e-6)


def test_sand_expansion_projects_to_rotation():
    n = 1
    f = jnp.asarray((np.eye(3) * 1.2).astype(np.float32))[None]  # tr > 0
    u, s, v = svd3(f)
    mu = jnp.full((n,), 1e5)
    lam = jnp.full((n,), 1e5)
    f_out = sand_return_mapping(f, u, s, v, mu, lam, alpha=0.3)
    # expansion with delta_gamma>0 -> F = U V^T (rotation)
    s_out = np.linalg.svd(np.asarray(f_out)[0], compute_uv=False)
    np.testing.assert_allclose(s_out, 1.0, atol=1e-5)


def test_combined_stress_dispatch_and_symmetry():
    st = _eye_state(n=16, material=0)
    # mix materials: jelly, metal, sand, snow
    mats = np.array([0] * 4 + [1] * 4 + [2] * 4 + [5] * 4, np.int32)
    st = st.replace(material=jnp.asarray(mats))
    rng = np.random.default_rng(2)
    f_trial = np.eye(3, dtype=np.float32) + 0.05 * rng.normal(size=(16, 3, 3)).astype(np.float32)
    st = st.replace(F_trial=jnp.asarray(f_trial))
    cfg = MPMConfig(active_materials=(0, 1, 2, 5))
    out = compute_stress_from_F_trial(st, cfg, 1e-4)
    stress = np.asarray(out.stress)
    assert np.isfinite(stress).all()
    np.testing.assert_allclose(stress, np.swapaxes(stress, -1, -2), atol=1e-3)


def test_inactive_material_branches_compile_away():
    st = _eye_state(n=4, material=0)
    cfg = MPMConfig(active_materials=(0,))
    out = compute_stress_from_F_trial(st, cfg, 1e-4)
    assert np.isfinite(np.asarray(out.stress)).all()
