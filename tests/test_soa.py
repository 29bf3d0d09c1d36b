"""SoA row-list math (sim/soa.py, sim/constitutive_soa.py) must agree with
the AoS implementations exactly (same op graphs, only layout differs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.sim import constitutive, constitutive_soa, mat3, soa
from pixie_tpu.sim.svd3 import svd3
from pixie_tpu.sim.types import MPMConfig

N = 257


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N, 3, 3)).astype(np.float32))
    return a, b


def test_matmul_variants(mats):
    a, b = mats
    ar, br = soa.aos_mat_to_rows(a), soa.aos_mat_to_rows(b)
    np.testing.assert_array_equal(
        soa.rows_to_aos_mat(soa.mm(ar, br)), mat3.matmul(a, b))
    np.testing.assert_array_equal(
        soa.rows_to_aos_mat(soa.mm_tn(ar, br)), mat3.matmul_tn(a, b))
    np.testing.assert_array_equal(
        soa.rows_to_aos_mat(soa.mm_nt(ar, br)), mat3.matmul_nt(a, b))
    np.testing.assert_array_equal(soa.det3(ar), mat3.det3(a))
    np.testing.assert_array_equal(
        soa.rows_to_aos_mat(soa.transpose(ar)), jnp.swapaxes(a, -1, -2))


def test_svd3_rows_matches_aos(mats):
    a, _ = mats
    # include near-singular and reflective cases
    a = jnp.concatenate([
        a,
        a * 1e-6,
        -a[:16],
        jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3)),
    ])
    u0, s0, v0 = svd3(a)
    ur, sr, vr = soa.svd3_rows(soa.aos_mat_to_rows(a))
    np.testing.assert_allclose(soa.rows_to_aos_mat(ur), u0, atol=1e-6)
    np.testing.assert_allclose(soa.rows_to_aos_vec(sr), s0, atol=1e-6)
    np.testing.assert_allclose(soa.rows_to_aos_mat(vr), v0, atol=1e-6)


@pytest.mark.parametrize("active", [(0,), (0, 1, 2, 5), (0, 3, 6), (2,)])
def test_compute_stress_rows_matches_aos(active):
    from pixie_tpu.sim.types import finalize_mu_lam, make_state

    rng = np.random.default_rng(3)
    n = 300
    x = rng.uniform(0.4, 1.6, (n, 3)).astype(np.float32)
    st = make_state(x, np.full(n, 1e-5, np.float32), density=300.0,
                    E=2e5, nu=0.3, yield_stress=1e3, bulk=1e5)
    mats_arr = rng.choice(np.array(active), size=n).astype(np.int32)
    # perturb F_trial away from identity
    F_t = (np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3))
           + 0.2 * rng.normal(size=(n, 3, 3)).astype(np.float32))
    sel = (rng.random(n) < 0.1).astype(np.int32)
    st = finalize_mu_lam(st.replace(
        material=jnp.asarray(mats_arr), F_trial=jnp.asarray(F_t),
        selection=jnp.asarray(sel),
    ))
    cfg = MPMConfig(n_grid=24, active_materials=tuple(active),
                    hardening=1.0, xi=0.1, plastic_viscosity=10.0)
    dt = jnp.float32(1e-4)

    out = constitutive.compute_stress_from_F_trial(st, cfg, dt)

    F_r, s_r, ys_r, mu_r, lam_r = constitutive_soa.compute_stress_rows(
        soa.aos_mat_to_rows(st.F_trial), soa.aos_mat_to_rows(st.F),
        soa.aos_mat_to_rows(st.stress), st.material, st.mu, st.lam,
        st.yield_stress, st.bulk, st.selection, cfg, dt,
    )
    np.testing.assert_allclose(soa.rows_to_aos_mat(F_r), out.F,
                               atol=1e-6, rtol=1e-6)
    # reassociation-level noise only (mean as sum/3 etc.)
    np.testing.assert_allclose(soa.rows_to_aos_mat(s_r), out.stress,
                               atol=1e-2, rtol=2e-4)
    np.testing.assert_allclose(ys_r, out.yield_stress, rtol=1e-6)
    np.testing.assert_allclose(mu_r, out.mu, rtol=1e-6)
    np.testing.assert_allclose(lam_r, out.lam, rtol=1e-6)
