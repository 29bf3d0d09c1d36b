"""Constitutive models: Kirchhoff stresses and plastic return mappings.

Vectorized (N,...) pure functions — the reference implements these as
per-particle Warp device functions (mpm_utils.py:10-279); here each model is
one fused batch of VPU array math sharing a single batched SVD.

Conventions follow the reference exactly:
  * singular values clamped at 0.01 before log (StVK/von Mises,
    mpm_utils.py:56-58,96-98),
  * von Mises yield on the deviatoric Kirchhoff stress norm
    (mpm_utils.py:89-135),
  * Drucker-Prager sand return mapping (mpm_utils.py:242-279),
  * weakly-compressible water with gamma=1.1 (mpm_utils.py:20-28),
  * final stress symmetrized (mpm_utils.py:525).
"""

from __future__ import annotations

import jax.numpy as jnp

from pixie_tpu.sim import mat3
from pixie_tpu.sim.mat3 import det3
from pixie_tpu.sim.svd3 import svd3
from pixie_tpu.sim.types import MPMConfig, MPMState

_ID3 = jnp.eye(3, dtype=jnp.float32)


def _u_s_vt(u, s_diag, v):
    """U diag(s) V^T (unrolled, VPU-friendly)."""
    return mat3.diag_mm_nt(u, s_diag, v)


# ---------------------------------------------------------------------------
# Kirchhoff stresses (tau = P F^T)
# ---------------------------------------------------------------------------

def kirchhoff_stress_fcr(F, u, v, J, mu, lam):
    """Fixed corotated (mpm_utils.py:10-17)."""
    R = mat3.matmul_nt(u, v)
    FmR_Ft = mat3.matmul_nt(F - R, F)
    return (
        2.0 * mu[:, None, None] * FmR_Ft
        + _ID3 * (lam * J * (J - 1.0))[:, None, None]
    )


def kirchhoff_stress_stvk(F, u, v, sig, mu, lam):
    """StVK with Hencky strain (mpm_utils.py:52-68)."""
    sig = jnp.maximum(sig, 0.01)
    eps = jnp.log(sig)
    log_sum = eps.sum(-1, keepdims=True)
    tau = 2.0 * mu[:, None] * eps + lam[:, None] * log_sum
    usvt = _u_s_vt(u, tau, v)
    return mat3.matmul_nt(usvt, F)


def kirchhoff_stress_drucker_prager(F, u, v, sig, mu, lam):
    """Drucker-Prager sand stress (mpm_utils.py:71-86)."""
    log_sig = jnp.log(sig)
    log_sum = log_sig.sum(-1, keepdims=True)
    center = (2.0 * mu[:, None] * log_sig + lam[:, None] * log_sum) / sig
    usvt = _u_s_vt(u, center, v)
    return mat3.matmul_nt(usvt, F)


def kirchhoff_stress_water(J, bulk):
    """Weakly compressible fluid, gamma=1.1 (mpm_utils.py:20-28)."""
    gamma = 1.1
    pressure = -bulk * (jnp.power(jnp.maximum(J, 1e-6), -gamma) - 1.0)
    return _ID3 * (J * pressure)[:, None, None]


def kirchhoff_stress_neo_hookean(F, u, v, J, sig, mu, lam):
    """Neo-Hookean (mpm_utils.py:30-49); kept for parity, unused by default."""
    b = sig * sig
    b_hat = b - b.mean(-1, keepdims=True)
    tau = (
        mu[:, None] * jnp.power(jnp.maximum(J, 1e-6), -2.0 / 3.0)[:, None] * b_hat
        + (lam / 2.0 * (J * J - 1.0))[:, None]
    )
    usvt = _u_s_vt(u, tau, v)
    return mat3.matmul_nt(usvt, F)


# ---------------------------------------------------------------------------
# Return mappings (F_trial -> F_elastic); each also returns updated material
# scalars where the reference mutates them.
# ---------------------------------------------------------------------------

def von_mises_return_mapping(F_trial, u, sig_old, v, mu, lam, yield_stress,
                             hardening, xi):
    """Metal plasticity (mpm_utils.py:89-135)."""
    sig = jnp.maximum(sig_old, 0.01)
    eps = jnp.log(sig)
    temp = eps.mean(-1, keepdims=True)

    tau = 2.0 * mu[:, None] * eps + lam[:, None] * eps.sum(-1, keepdims=True)
    cond = tau - tau.mean(-1, keepdims=True)
    yielding = jnp.linalg.norm(cond, axis=-1) > yield_stress

    eps_hat = eps - temp
    eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    eps_proj = eps - (delta_gamma / eps_hat_norm)[:, None] * eps_hat
    F_elastic = _u_s_vt(u, jnp.exp(eps_proj), v)

    F_new = jnp.where(yielding[:, None, None], F_elastic, F_trial)
    ys_new = jnp.where(
        yielding & (hardening == 1),
        yield_stress + 2.0 * mu * xi * delta_gamma,
        yield_stress,
    )
    return F_new, ys_new


def von_mises_return_mapping_with_damage(F_trial, u, sig_old, v, mu, lam,
                                         yield_stress, hardening, xi, softening):
    """Snow: von Mises + softening damage (mpm_utils.py:138-191)."""
    sig = jnp.maximum(sig_old, 0.01)
    eps = jnp.log(sig)
    temp = eps.mean(-1, keepdims=True)

    tau = 2.0 * mu[:, None] * eps + lam[:, None] * eps.sum(-1, keepdims=True)
    cond = tau - tau.mean(-1, keepdims=True)
    over_yield = jnp.linalg.norm(cond, axis=-1) > yield_stress
    # already fully damaged -> behaves elastically (returns F_trial)
    yielding = over_yield & (yield_stress > 0)

    eps_hat = eps - temp
    eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    corr = (delta_gamma / eps_hat_norm)[:, None] * eps_hat
    eps_proj = eps - corr
    F_elastic = _u_s_vt(u, jnp.exp(eps_proj), v)

    ys_soft = yield_stress - softening * jnp.linalg.norm(corr, axis=-1)
    damaged = ys_soft <= 0
    mu_new = jnp.where(yielding & damaged, 0.0, mu)
    lam_new = jnp.where(yielding & damaged, 0.0, lam)
    ys_new = jnp.where(yielding, ys_soft, yield_stress)
    ys_new = jnp.where(
        yielding & (hardening == 1), ys_new + 2.0 * mu_new * xi * delta_gamma, ys_new
    )
    F_new = jnp.where(yielding[:, None, None], F_elastic, F_trial)
    return F_new, ys_new, mu_new, lam_new


def viscoplasticity_return_mapping_stvk(F_trial, u, sig_old, v, mu, lam,
                                        yield_stress, plastic_viscosity, dt):
    """Viscoplastic StVK, e.g. toothpaste (mpm_utils.py:195-239)."""
    sig = jnp.maximum(sig_old, 0.01)
    b_trial = sig * sig
    eps = jnp.log(sig)
    trace_eps = eps.sum(-1, keepdims=True)
    eps_hat = eps - trace_eps / 3.0
    s_trial = 2.0 * mu[:, None] * eps_hat
    s_trial_norm = jnp.linalg.norm(s_trial, axis=-1)
    y = s_trial_norm - jnp.sqrt(2.0 / 3.0) * yield_stress
    yielding = y > 0

    mu_hat = mu * b_trial.mean(-1)
    s_new_norm = s_trial_norm - y / (
        1.0 + plastic_viscosity / (2.0 * jnp.maximum(mu_hat, 1e-12) * dt)
    )
    s_new = (s_new_norm / jnp.maximum(s_trial_norm, 1e-12))[:, None] * s_trial
    eps_new = s_new / (2.0 * mu[:, None]) + trace_eps / 3.0
    F_elastic = _u_s_vt(u, jnp.exp(eps_new), v)
    return jnp.where(yielding[:, None, None], F_elastic, F_trial)


def sand_return_mapping(F_trial, u, sig, v, mu, lam, alpha):
    """Drucker-Prager sand (mpm_utils.py:242-279)."""
    eps = jnp.log(jnp.maximum(jnp.abs(sig), 1e-14))
    tr = eps.sum(-1)
    eps_hat = eps - (tr / 3.0)[:, None]
    eps_hat_norm = jnp.linalg.norm(eps_hat, axis=-1)
    delta_gamma = eps_hat_norm + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha

    # case 1: no plasticity
    F_case1 = F_trial
    # case 2: expansion -> project to rotation
    F_case2 = mat3.matmul_nt(u, v)
    # case 3: compaction -> project onto the yield surface
    h = eps - eps_hat * (delta_gamma / jnp.maximum(eps_hat_norm, 1e-12))[:, None]
    F_case3 = _u_s_vt(u, jnp.exp(h), v)

    F_new = jnp.where(
        (delta_gamma <= 0)[:, None, None],
        F_case1,
        jnp.where((tr > 0)[:, None, None], F_case2, F_case3),
    )
    return F_new


# ---------------------------------------------------------------------------
# Combined: return map + stress (compute_stress_from_F_trial, mpm_utils.py:466-526)
# ---------------------------------------------------------------------------

def compute_stress_from_F_trial(state: MPMState, cfg: MPMConfig, dt) -> MPMState:
    """Apply the material-dependent return mapping to F_trial, then compute the
    Kirchhoff stress of the result.  Materials are selected with jnp.where;
    models not present in cfg.active_materials compile away entirely."""
    mat = state.material
    F_trial = state.F_trial
    mu, lam = state.mu, state.lam
    ys = state.yield_stress

    F = F_trial
    mu_new, lam_new, ys_new = mu, lam, ys

    if cfg.needs_return_mapping():
        u_t, sig_t, v_t = svd3(F_trial)
        if 1 in cfg.active_materials:
            F_vm, ys_vm = von_mises_return_mapping(
                F_trial, u_t, sig_t, v_t, mu, lam, ys, cfg.hardening, cfg.xi
            )
            sel = (mat == 1)
            F = jnp.where(sel[:, None, None], F_vm, F)
            ys_new = jnp.where(sel, ys_vm, ys_new)
        if 2 in cfg.active_materials:
            F_sand = sand_return_mapping(F_trial, u_t, sig_t, v_t, mu, lam, cfg.alpha)
            F = jnp.where((mat == 2)[:, None, None], F_sand, F)
        if 3 in cfg.active_materials:
            F_vp = viscoplasticity_return_mapping_stvk(
                F_trial, u_t, sig_t, v_t, mu, lam, ys, cfg.plastic_viscosity, dt
            )
            F = jnp.where((mat == 3)[:, None, None], F_vp, F)
        if 5 in cfg.active_materials:
            F_sn, ys_sn, mu_sn, lam_sn = von_mises_return_mapping_with_damage(
                F_trial, u_t, sig_t, v_t, mu, lam, ys,
                cfg.hardening, cfg.xi, cfg.softening,
            )
            sel = (mat == 5)
            F = jnp.where(sel[:, None, None], F_sn, F)
            ys_new = jnp.where(sel, ys_sn, ys_new)
            mu_new = jnp.where(sel, mu_sn, mu_new)
            lam_new = jnp.where(sel, lam_sn, lam_new)

    # stress of the mapped F
    J = det3(F)
    u, sig, v = svd3(F)

    stress = jnp.zeros_like(F)
    if 0 in cfg.active_materials or 5 in cfg.active_materials or 6 in cfg.active_materials:
        s_fcr = kirchhoff_stress_fcr(F, u, v, J, mu_new, lam_new)
        sel = (mat == 0) | (mat == 5)
        stress = jnp.where(sel[:, None, None], s_fcr, stress)
    if 1 in cfg.active_materials or 3 in cfg.active_materials:
        s_stvk = kirchhoff_stress_stvk(F, u, v, sig, mu_new, lam_new)
        sel = (mat == 1) | (mat == 3)
        stress = jnp.where(sel[:, None, None], s_stvk, stress)
    if 2 in cfg.active_materials:
        s_dp = kirchhoff_stress_drucker_prager(F, u, v, sig, mu_new, lam_new)
        stress = jnp.where((mat == 2)[:, None, None], s_dp, stress)
    if 6 in cfg.active_materials:
        # NOTE: reference uses material==6 for fluid stress in
        # compute_stress_from_F_trial (mpm_utils.py:519) even though the
        # taxonomy maps 6 to "stationary"; stationary particles are pinned by
        # BCs, so we reproduce the same selection for parity.
        s_w = kirchhoff_stress_water(J, state.bulk)
        stress = jnp.where((mat == 6)[:, None, None], s_w, stress)

    stress = 0.5 * (stress + jnp.swapaxes(stress, -1, -2))

    active = (state.selection == 0)
    F_out = jnp.where(active[:, None, None], F, state.F)
    stress_out = jnp.where(active[:, None, None], stress, state.stress)
    return state.replace(
        F=F_out,
        stress=stress_out,
        yield_stress=jnp.where(active, ys_new, state.yield_stress),
        mu=jnp.where(active, mu_new, state.mu),
        lam=jnp.where(active, lam_new, state.lam),
    )
