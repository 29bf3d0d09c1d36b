"""Scalar NumPy MPM oracle — an independent per-particle transliteration of
the reference Warp kernels (mpm_utils.py:282-527) used as a golden-value
fixture for the vectorized JAX solver.

Everything here is deliberately written as plain per-particle loops in
float64 so that any vectorization/layout/reduction bug in the JAX solver
shows up as a mismatch.  Semantics mirror, kernel by kernel:

  * compute_stress_from_F_trial  (mpm_utils.py:469-527)
  * constitutive stresses        (mpm_utils.py:10-88)
  * return mappings              (mpm_utils.py:91-281)
  * p2g_apic_with_stress         (mpm_utils.py:338-395)
  * grid_normalization_and_gravity (mpm_utils.py:398-409)
  * add_damping_via_grid         (mpm_utils.py:583-588)
  * g2p                          (mpm_utils.py:412-463) incl. update_cov
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class OracleParams:
    n_grid: int = 16
    grid_lim: float = 2.0
    gravity: tuple = (0.0, 0.0, 0.0)
    rpic_damping: float = 0.0
    grid_v_damping_scale: float = 1.1  # >1 -> disabled, as the reference
    update_cov_with_F: bool = False
    hardening: float = 0.0
    xi: float = 0.0
    friction_angle: float = 25.0
    plastic_viscosity: float = 0.0
    softening: float = 0.1

    @property
    def dx(self):
        return self.grid_lim / self.n_grid

    @property
    def inv_dx(self):
        return self.n_grid / self.grid_lim

    @property
    def alpha(self):
        sin_phi = np.sin(self.friction_angle / 180.0 * 3.14159265)
        return np.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)


# ---------------------------------------------------------------------------
# constitutive stresses (single particle, 3x3 matrices)
# ---------------------------------------------------------------------------

def kirchhoff_stress_fcr(F, U, V, J, mu, lam):
    R = U @ V.T
    return 2.0 * mu * (F - R) @ F.T + np.eye(3) * lam * J * (J - 1.0)


def kirchhoff_stress_stvk(F, U, V, sig, mu, lam):
    sig = np.maximum(sig, 0.01)
    eps = np.log(sig)
    tau = 2.0 * mu * eps + lam * eps.sum()
    return U @ np.diag(tau) @ V.T @ F.T


def kirchhoff_stress_drucker_prager(F, U, V, sig, mu, lam):
    log_sig_sum = np.log(sig).sum()
    center = 2.0 * mu * np.log(sig) / sig + lam * log_sig_sum / sig
    return U @ np.diag(center) @ V.T @ F.T


def kirchhoff_stress_water(J, bulk):
    gamma = 1.1
    pressure = -bulk * (J ** (-gamma) - 1.0)
    return J * pressure * np.eye(3)


# ---------------------------------------------------------------------------
# return mappings (single particle); may mutate mu/lam/yield_stress in `mat`
# ---------------------------------------------------------------------------

def von_mises_return_mapping(F_trial, mu, lam, yield_stress, hardening, xi):
    U, sig_old, Vt = np.linalg.svd(F_trial)
    V = Vt.T
    sig = np.maximum(sig_old, 0.01)
    eps = np.log(sig)
    temp = eps.mean()
    tau = 2.0 * mu * eps + lam * eps.sum()
    cond = tau - tau.sum() / 3.0
    if np.linalg.norm(cond) > yield_stress:
        eps_hat = eps - temp
        eps_hat_norm = np.linalg.norm(eps_hat) + 1e-6
        delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
        eps = eps - (delta_gamma / eps_hat_norm) * eps_hat
        F_el = U @ np.diag(np.exp(eps)) @ V.T
        if hardening == 1:
            yield_stress = yield_stress + 2.0 * mu * xi * delta_gamma
        return F_el, yield_stress, mu, lam
    return F_trial, yield_stress, mu, lam


def von_mises_return_mapping_with_damage(F_trial, mu, lam, yield_stress,
                                         softening, hardening, xi):
    U, sig_old, Vt = np.linalg.svd(F_trial)
    V = Vt.T
    sig = np.maximum(sig_old, 0.01)
    eps = np.log(sig)
    temp = eps.mean()
    tau = 2.0 * mu * eps + lam * eps.sum()
    cond = tau - tau.sum() / 3.0
    if np.linalg.norm(cond) > yield_stress:
        if yield_stress <= 0:
            return F_trial, yield_stress, mu, lam
        eps_hat = eps - temp
        eps_hat_norm = np.linalg.norm(eps_hat) + 1e-6
        delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
        eps = eps - (delta_gamma / eps_hat_norm) * eps_hat
        yield_stress = yield_stress - softening * np.linalg.norm(
            (delta_gamma / eps_hat_norm) * eps_hat
        )
        if yield_stress <= 0:
            mu = 0.0
            lam = 0.0
        F_el = U @ np.diag(np.exp(eps)) @ V.T
        if hardening == 1:
            yield_stress = yield_stress + 2.0 * mu * xi * delta_gamma
        return F_el, yield_stress, mu, lam
    return F_trial, yield_stress, mu, lam


def viscoplasticity_return_mapping_stvk(F_trial, mu, lam, yield_stress,
                                        plastic_viscosity, dt):
    U, sig_old, Vt = np.linalg.svd(F_trial)
    V = Vt.T
    sig = np.maximum(sig_old, 0.01)
    b_trial = sig * sig
    eps = np.log(sig)
    trace_eps = eps.sum()
    eps_hat = eps - trace_eps / 3.0
    s_trial = 2.0 * mu * eps_hat
    s_trial_norm = np.linalg.norm(s_trial)
    y = s_trial_norm - np.sqrt(2.0 / 3.0) * yield_stress
    if y > 0:
        mu_hat = mu * b_trial.mean()
        s_new_norm = s_trial_norm - y / (1.0 + plastic_viscosity / (2.0 * mu_hat * dt))
        s_new = (s_new_norm / s_trial_norm) * s_trial
        eps_new = s_new / (2.0 * mu) + trace_eps / 3.0
        return U @ np.diag(np.exp(eps_new)) @ V.T
    return F_trial


def sand_return_mapping(F_trial, mu, lam, alpha):
    U, sig, Vt = np.linalg.svd(F_trial)
    V = Vt.T
    eps = np.log(np.maximum(np.abs(sig), 1e-14))
    tr = eps.sum()
    eps_hat = eps - tr / 3.0
    eps_hat_norm = np.linalg.norm(eps_hat)
    delta_gamma = eps_hat_norm + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha
    if delta_gamma <= 0:
        return F_trial
    if tr > 0:
        return U @ V.T
    H = eps - eps_hat * (delta_gamma / eps_hat_norm)
    return U @ np.diag(np.exp(H)) @ V.T


# ---------------------------------------------------------------------------
# the substep, kernel by kernel
# ---------------------------------------------------------------------------

def _spline(x, inv_dx):
    """Quadratic B-spline weights and derivative rows for one particle."""
    grid_pos = x * inv_dx
    base = np.floor(grid_pos - 0.5).astype(int)
    fx = grid_pos - base
    wa, wb, wc = 1.5 - fx, fx - 1.0, fx - 0.5
    w = np.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc])  # (3 taps, 3 dims)
    dw = np.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5])
    return base, fx, w, dw


def compute_stress(st: dict, prm: OracleParams, dt: float):
    n = len(st["x"])
    for p in range(n):
        if st["selection"][p] != 0:
            continue
        mat = st["material"][p]
        mu, lam = st["mu"][p], st["lam"][p]
        F_trial = st["F_trial"][p]
        ys = st["yield_stress"][p]
        if mat == 1:
            F, ys, mu, lam = von_mises_return_mapping(
                F_trial, mu, lam, ys, prm.hardening, prm.xi)
        elif mat == 2:
            F = sand_return_mapping(F_trial, mu, lam, prm.alpha)
        elif mat == 3:
            F = viscoplasticity_return_mapping_stvk(
                F_trial, mu, lam, ys, prm.plastic_viscosity, dt)
        elif mat == 5:
            F, ys, mu, lam = von_mises_return_mapping_with_damage(
                F_trial, mu, lam, ys, prm.softening, prm.hardening, prm.xi)
        else:
            F = F_trial
        st["F"][p] = F
        st["yield_stress"][p], st["mu"][p], st["lam"][p] = ys, mu, lam

        J = np.linalg.det(F)
        U, sig, Vt = np.linalg.svd(F)
        V = Vt.T
        stress = np.zeros((3, 3))
        if mat in (0, 5):
            stress = kirchhoff_stress_fcr(F, U, V, J, mu, lam)
        if mat == 1:
            stress = kirchhoff_stress_stvk(F, U, V, np.maximum(sig, 0.01), mu, lam)
        if mat == 2:
            stress = kirchhoff_stress_drucker_prager(F, U, V, sig, mu, lam)
        if mat == 3:
            stress = kirchhoff_stress_stvk(F, U, V, np.maximum(sig, 0.01), mu, lam)
        if mat == 6:
            # the reference's material-6 water quirk (mpm_utils.py:519-522)
            stress = kirchhoff_stress_water(J, st["bulk"][p])
        st["stress"][p] = (stress + stress.T) / 2.0


def p2g(st: dict, prm: OracleParams, dt: float):
    g = prm.n_grid
    grid_v_in = np.zeros((g, g, g, 3))
    grid_m = np.zeros((g, g, g))
    for p in range(len(st["x"])):
        if st["selection"][p] != 0:
            continue
        base, fx, w, dw = _spline(st["x"][p], prm.inv_dx)
        C = st["C"][p]
        C = (1.0 - prm.rpic_damping) * C + prm.rpic_damping / 2.0 * (C - C.T)
        if prm.rpic_damping < -0.001:
            C = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    dpos = (np.array([i, j, k]) - fx) * prm.dx
                    ix, iy, iz = base + (i, j, k)
                    weight = w[i, 0] * w[j, 1] * w[k, 2]
                    dweight = np.array([
                        dw[i, 0] * w[j, 1] * w[k, 2],
                        w[i, 0] * dw[j, 1] * w[k, 2],
                        w[i, 0] * w[j, 1] * dw[k, 2],
                    ]) * prm.inv_dx
                    elastic_force = -st["vol"][p] * st["stress"][p] @ dweight
                    v_in_add = (weight * st["mass"][p] * (st["v"][p] + C @ dpos)
                                + dt * elastic_force)
                    grid_v_in[ix, iy, iz] += v_in_add
                    grid_m[ix, iy, iz] += weight * st["mass"][p]
    return grid_v_in, grid_m


def grid_update(grid_v_in, grid_m, prm: OracleParams, dt: float):
    g = prm.n_grid
    grid_v_out = np.zeros_like(grid_v_in)
    nonempty = grid_m > 1e-15
    grid_v_out[nonempty] = (grid_v_in[nonempty] / grid_m[nonempty, None]
                            + dt * np.asarray(prm.gravity))
    if prm.grid_v_damping_scale < 1.0:
        grid_v_out *= prm.grid_v_damping_scale
    return grid_v_out


def g2p(st: dict, grid_v_out, prm: OracleParams, dt: float):
    for p in range(len(st["x"])):
        if st["selection"][p] != 0:
            continue
        base, fx, w, dw = _spline(st["x"][p], prm.inv_dx)
        new_v = np.zeros(3)
        new_C = np.zeros((3, 3))
        new_F = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    ix, iy, iz = base + (i, j, k)
                    dpos = np.array([i, j, k]) - fx
                    weight = w[i, 0] * w[j, 1] * w[k, 2]
                    gv = grid_v_out[ix, iy, iz]
                    new_v += gv * weight
                    new_C += np.outer(gv, dpos) * (weight * prm.inv_dx * 4.0)
                    dweight = np.array([
                        dw[i, 0] * w[j, 1] * w[k, 2],
                        w[i, 0] * dw[j, 1] * w[k, 2],
                        w[i, 0] * w[j, 1] * dw[k, 2],
                    ]) * prm.inv_dx
                    new_F += np.outer(gv, dweight)
        st["v"][p] = new_v
        st["x"][p] = st["x"][p] + dt * new_v
        st["C"][p] = new_C
        st["F_trial"][p] = (np.eye(3) + new_F * dt) @ st["F"][p]
        if prm.update_cov_with_F:
            c = st["cov"][p]
            cov_n = np.array([[c[0], c[1], c[2]],
                              [c[1], c[3], c[4]],
                              [c[2], c[4], c[5]]])
            cov_np1 = cov_n + dt * (new_F @ cov_n + cov_n @ new_F.T)
            st["cov"][p] = np.array([cov_np1[0, 0], cov_np1[0, 1], cov_np1[0, 2],
                                     cov_np1[1, 1], cov_np1[1, 2], cov_np1[2, 2]])


def substep(st: dict, prm: OracleParams, dt: float):
    compute_stress(st, prm, dt)
    grid_v_in, grid_m = p2g(st, prm, dt)
    grid_v_out = grid_update(grid_v_in, grid_m, prm, dt)
    g2p(st, grid_v_out, prm, dt)


def make_oracle_state(x, vol, density=200.0, E=1e5, nu=0.4, material=0,
                      yield_stress=0.0, cov=None):
    """Mirror of make_state + finalize_mu_lam in float64."""
    n = len(x)
    x = np.asarray(x, np.float64)

    def full(v):
        return np.full(n, v, np.float64) if np.ndim(v) == 0 else np.asarray(v, np.float64)

    E, nu, density = full(E), full(nu), full(density)
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return {
        "x": x.copy(),
        "v": np.zeros((n, 3)),
        "F": np.tile(np.eye(3), (n, 1, 1)),
        "F_trial": np.tile(np.eye(3), (n, 1, 1)),
        "C": np.zeros((n, 3, 3)),
        "stress": np.zeros((n, 3, 3)),
        "cov": (np.zeros((n, 6)) if cov is None else np.asarray(cov, np.float64).copy()),
        "vol": full(vol) if np.ndim(vol) == 0 else np.asarray(vol, np.float64),
        "mass": density * np.asarray(vol, np.float64),
        "density": density,
        "material": (np.full(n, material, int) if np.ndim(material) == 0
                     else np.asarray(material, int)),
        "selection": np.zeros(n, int),
        "E": E,
        "nu": nu,
        "mu": mu,
        "lam": lam,
        "bulk": lam + 2.0 / 3.0 * mu,
        "yield_stress": full(yield_stress),
    }
