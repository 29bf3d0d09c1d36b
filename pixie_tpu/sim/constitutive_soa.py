"""SoA constitutive models: row-list ports of sim/constitutive.py.

Same math, same reference citations (Warp kernels mpm_utils.py:10-279);
operands are row lists (sim/soa.py) so every op runs full-lane on TPU.
tests/test_soa.py asserts exact agreement with the AoS implementations.
"""

from __future__ import annotations

import jax.numpy as jnp

from pixie_tpu.sim import soa
from pixie_tpu.sim.soa import det3, diag_mm_nt, mm_nt, svd3_rows, where_rows
from pixie_tpu.sim.types import MPMConfig


def _norm3l(v):
    return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def _diag_rows(d):
    zero = jnp.zeros_like(d)
    return [d, zero, zero, zero, d, zero, zero, zero, d]


def kirchhoff_stress_fcr(F, u, v, J, mu, lam):
    """Fixed corotated (mpm_utils.py:10-17)."""
    R = mm_nt(u, v)
    FmR = [a - b for a, b in zip(F, R)]
    FmR_Ft = mm_nt(FmR, F)
    d = lam * J * (J - 1.0)
    return [2.0 * mu * x + y for x, y in zip(FmR_Ft, _diag_rows(d))]


def kirchhoff_stress_stvk(F, u, v, sig, mu, lam):
    """StVK with Hencky strain (mpm_utils.py:52-68)."""
    eps = [jnp.log(jnp.maximum(s, 0.01)) for s in sig]
    log_sum = eps[0] + eps[1] + eps[2]
    tau = [2.0 * mu * e + lam * log_sum for e in eps]
    return mm_nt(diag_mm_nt(u, tau, v), F)


def kirchhoff_stress_drucker_prager(F, u, v, sig, mu, lam):
    """Drucker-Prager sand stress (mpm_utils.py:71-86)."""
    log_sig = [jnp.log(s) for s in sig]
    log_sum = log_sig[0] + log_sig[1] + log_sig[2]
    center = [(2.0 * mu * ls + lam * log_sum) / s for ls, s in zip(log_sig, sig)]
    return mm_nt(diag_mm_nt(u, center, v), F)


def kirchhoff_stress_water(J, bulk):
    """Weakly compressible fluid, gamma=1.1 (mpm_utils.py:20-28)."""
    gamma = 1.1
    pressure = -bulk * (jnp.power(jnp.maximum(J, 1e-6), -gamma) - 1.0)
    return _diag_rows(J * pressure)


def von_mises_return_mapping(F_trial, u, sig_old, v, mu, lam, yield_stress,
                             hardening, xi):
    """Metal plasticity (mpm_utils.py:89-135)."""
    sig = [jnp.maximum(s, 0.01) for s in sig_old]
    eps = [jnp.log(s) for s in sig]
    temp = (eps[0] + eps[1] + eps[2]) / 3.0

    eps_sum = eps[0] + eps[1] + eps[2]
    tau = [2.0 * mu * e + lam * eps_sum for e in eps]
    tau_mean = (tau[0] + tau[1] + tau[2]) / 3.0
    cond = [t - tau_mean for t in tau]
    yielding = _norm3l(cond) > yield_stress

    eps_hat = [e - temp for e in eps]
    eps_hat_norm = _norm3l(eps_hat) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    r = delta_gamma / eps_hat_norm
    eps_proj = [e - r * eh for e, eh in zip(eps, eps_hat)]
    F_elastic = diag_mm_nt(u, [jnp.exp(e) for e in eps_proj], v)

    F_new = where_rows(yielding, F_elastic, F_trial)
    ys_new = jnp.where(
        yielding & (hardening == 1),
        yield_stress + 2.0 * mu * xi * delta_gamma,
        yield_stress,
    )
    return F_new, ys_new


def von_mises_return_mapping_with_damage(F_trial, u, sig_old, v, mu, lam,
                                         yield_stress, hardening, xi, softening):
    """Snow: von Mises + softening damage (mpm_utils.py:138-191)."""
    sig = [jnp.maximum(s, 0.01) for s in sig_old]
    eps = [jnp.log(s) for s in sig]
    temp = (eps[0] + eps[1] + eps[2]) / 3.0

    eps_sum = eps[0] + eps[1] + eps[2]
    tau = [2.0 * mu * e + lam * eps_sum for e in eps]
    tau_mean = (tau[0] + tau[1] + tau[2]) / 3.0
    cond = [t - tau_mean for t in tau]
    over_yield = _norm3l(cond) > yield_stress
    yielding = over_yield & (yield_stress > 0)

    eps_hat = [e - temp for e in eps]
    eps_hat_norm = _norm3l(eps_hat) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    r = delta_gamma / eps_hat_norm
    corr = [r * eh for eh in eps_hat]
    eps_proj = [e - c for e, c in zip(eps, corr)]
    F_elastic = diag_mm_nt(u, [jnp.exp(e) for e in eps_proj], v)

    ys_soft = yield_stress - softening * _norm3l(corr)
    damaged = ys_soft <= 0
    mu_new = jnp.where(yielding & damaged, 0.0, mu)
    lam_new = jnp.where(yielding & damaged, 0.0, lam)
    ys_new = jnp.where(yielding, ys_soft, yield_stress)
    ys_new = jnp.where(
        yielding & (hardening == 1), ys_new + 2.0 * mu_new * xi * delta_gamma,
        ys_new,
    )
    F_new = where_rows(yielding, F_elastic, F_trial)
    return F_new, ys_new, mu_new, lam_new


def viscoplasticity_return_mapping_stvk(F_trial, u, sig_old, v, mu, lam,
                                        yield_stress, plastic_viscosity, dt):
    """Viscoplastic StVK (mpm_utils.py:195-239)."""
    sig = [jnp.maximum(s, 0.01) for s in sig_old]
    b_trial = [s * s for s in sig]
    eps = [jnp.log(s) for s in sig]
    trace_eps = eps[0] + eps[1] + eps[2]
    eps_hat = [e - trace_eps / 3.0 for e in eps]
    s_trial = [2.0 * mu * e for e in eps_hat]
    s_trial_norm = _norm3l(s_trial)
    y = s_trial_norm - jnp.sqrt(2.0 / 3.0) * yield_stress
    yielding = y > 0

    mu_hat = mu * (b_trial[0] + b_trial[1] + b_trial[2]) / 3.0
    s_new_norm = s_trial_norm - y / (
        1.0 + plastic_viscosity / (2.0 * jnp.maximum(mu_hat, 1e-12) * dt)
    )
    r = s_new_norm / jnp.maximum(s_trial_norm, 1e-12)
    s_new = [r * s for s in s_trial]
    eps_new = [s / (2.0 * mu) + trace_eps / 3.0 for s in s_new]
    F_elastic = diag_mm_nt(u, [jnp.exp(e) for e in eps_new], v)
    return where_rows(yielding, F_elastic, F_trial)


def sand_return_mapping(F_trial, u, sig, v, mu, lam, alpha):
    """Drucker-Prager sand (mpm_utils.py:242-279)."""
    eps = [jnp.log(jnp.maximum(jnp.abs(s), 1e-14)) for s in sig]
    tr = eps[0] + eps[1] + eps[2]
    eps_hat = [e - tr / 3.0 for e in eps]
    eps_hat_norm = _norm3l(eps_hat)
    delta_gamma = eps_hat_norm + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha

    F_case2 = mm_nt(u, v)
    r = delta_gamma / jnp.maximum(eps_hat_norm, 1e-12)
    h = [e - r * eh for e, eh in zip(eps, eps_hat)]
    F_case3 = diag_mm_nt(u, [jnp.exp(x) for x in h], v)

    F_new = where_rows(
        delta_gamma <= 0, F_trial, where_rows(tr > 0, F_case2, F_case3))
    return F_new


def compute_stress_rows(F_trial, F_old, stress_old, mat, mu, lam, ys, bulk,
                        selection, cfg: MPMConfig, dt):
    """Row-list port of constitutive.compute_stress_from_F_trial
    (mpm_utils.py:466-526).  Returns (F, stress, ys, mu, lam) with the
    active-particle masking applied (inactive rows keep their old values)."""
    F = F_trial
    mu_new, lam_new, ys_new = mu, lam, ys

    if cfg.needs_return_mapping():
        u_t, sig_t, v_t = svd3_rows(F_trial)
        if 1 in cfg.active_materials:
            F_vm, ys_vm = von_mises_return_mapping(
                F_trial, u_t, sig_t, v_t, mu, lam, ys, cfg.hardening, cfg.xi)
            sel = mat == 1
            F = where_rows(sel, F_vm, F)
            ys_new = jnp.where(sel, ys_vm, ys_new)
        if 2 in cfg.active_materials:
            F_sand = sand_return_mapping(F_trial, u_t, sig_t, v_t, mu, lam,
                                         cfg.alpha)
            F = where_rows(mat == 2, F_sand, F)
        if 3 in cfg.active_materials:
            F_vp = viscoplasticity_return_mapping_stvk(
                F_trial, u_t, sig_t, v_t, mu, lam, ys, cfg.plastic_viscosity, dt)
            F = where_rows(mat == 3, F_vp, F)
        if 5 in cfg.active_materials:
            F_sn, ys_sn, mu_sn, lam_sn = von_mises_return_mapping_with_damage(
                F_trial, u_t, sig_t, v_t, mu, lam, ys,
                cfg.hardening, cfg.xi, cfg.softening)
            sel = mat == 5
            F = where_rows(sel, F_sn, F)
            ys_new = jnp.where(sel, ys_sn, ys_new)
            mu_new = jnp.where(sel, mu_sn, mu_new)
            lam_new = jnp.where(sel, lam_sn, lam_new)

    J = det3(F)
    u, sig, v = svd3_rows(F)

    stress = [jnp.zeros_like(F[0]) for _ in range(9)]
    if (0 in cfg.active_materials or 5 in cfg.active_materials
            or 6 in cfg.active_materials):
        s_fcr = kirchhoff_stress_fcr(F, u, v, J, mu_new, lam_new)
        stress = where_rows((mat == 0) | (mat == 5), s_fcr, stress)
    if 1 in cfg.active_materials or 3 in cfg.active_materials:
        s_stvk = kirchhoff_stress_stvk(F, u, v, sig, mu_new, lam_new)
        stress = where_rows((mat == 1) | (mat == 3), s_stvk, stress)
    if 2 in cfg.active_materials:
        s_dp = kirchhoff_stress_drucker_prager(F, u, v, sig, mu_new, lam_new)
        stress = where_rows(mat == 2, s_dp, stress)
    if 6 in cfg.active_materials:
        # reference quirk: material==6 takes the fluid stress here
        # (mpm_utils.py:519); see constitutive.py for the parity note
        s_w = kirchhoff_stress_water(J, bulk)
        stress = where_rows(mat == 6, s_w, stress)

    stress = soa.sym_rows(stress)

    active = selection == 0
    F_out = where_rows(active, F, F_old)
    stress_out = where_rows(active, stress, stress_old)
    return (
        F_out,
        stress_out,
        jnp.where(active, ys_new, ys),
        jnp.where(active, mu_new, mu),
        jnp.where(active, lam_new, lam),
    )
