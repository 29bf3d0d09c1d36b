"""MLS-MPM solver: explicit APIC/RPIC transfer with quadratic B-splines.

TPU-native redesign of PhysGaussian's Warp solver
(mpm_solver_warp/mpm_solver_warp.py:514-637 ``p2g2p`` and the kernels in
mpm_utils.py:282-527):

  * the whole substep is ONE traced function — XLA fuses what the reference
    runs as 8+ kernel launches with host round-trips between them;
  * a frame (hundreds of substeps) is a single ``lax.scan`` — zero host sync
    inside a frame, vs. ~8 launches/substep x 400 substeps in the reference;
  * P2G scatter uses XLA scatter-add (deterministic, fixed reduction order —
    bit-reproducible rollouts, unlike ``wp.atomic_add``); a Pallas
    grid-in-VMEM kernel is the optimized path (pixie_tpu.ops);
  * boundary conditions are a static schema applied in order (see bc.py),
    replacing runtime-generated kernel closures.

State layout and numerics match the reference (see constitutive.py, types.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

import numpy as np

from pixie_tpu.sim import bc as bc_mod
from pixie_tpu.sim import mat3
from pixie_tpu.sim.constitutive import compute_stress_from_F_trial
from pixie_tpu.sim.svd3 import svd3
from pixie_tpu.sim.types import MPMConfig, MPMState, finalize_mu_lam, make_state

# The 27 quadratic B-spline stencil offsets, static.
_OFFSETS = np.array(
    [(i, j, k) for i in range(3) for j in range(3) for k in range(3)], np.int32
)


def _spline_weights(x, inv_dx):
    """Quadratic B-spline weights and derivatives per particle per axis.

    Returns (base (N,3) int32, fx (N,3), w (N,3,3), dw (N,3,3)) where
    w[:, o, a] is the weight of offset o on axis a
    (p2g_apic_with_stress, mpm_utils.py:342-358).
    """
    grid_pos = x * inv_dx
    base = jnp.floor(grid_pos - 0.5).astype(jnp.int32)
    fx = grid_pos - base.astype(jnp.float32)
    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=1)
    dw = jnp.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5], axis=1)
    return base, fx, w, dw


def p2g(state: MPMState, cfg: MPMConfig, dt) -> jnp.ndarray:
    """Particle-to-grid scatter of momentum, mass and stress force.

    Returns grid (G,G,G,4): [momentum_x, momentum_y, momentum_z, mass].
    Mirrors p2g_apic_with_stress (mpm_utils.py:338-394) with the atomic
    scatters replaced by one deterministic XLA scatter-add.
    """
    n = state.n_particles
    g = cfg.n_grid
    inv_dx, dx = cfg.inv_dx, cfg.dx

    base, fx, w, dw = _spline_weights(state.x, inv_dx)

    # RPIC / PIC damping of C (static branch, mpm_utils.py:372-379)
    C = state.C
    if cfg.rpic_damping < -0.001:
        C = jnp.zeros_like(C)
    elif cfg.rpic_damping != 0.0:
        C = (1.0 - cfg.rpic_damping) * C + cfg.rpic_damping / 2.0 * (
            C - jnp.swapaxes(C, -1, -2)
        )

    active = (state.selection == 0).astype(jnp.float32)
    mass = state.mass * active
    stress_scaled = -state.vol[:, None, None] * state.stress * dt  # fold dt in

    offs = jnp.asarray(_OFFSETS)  # (27,3)

    # Per-offset per-axis weights: (27, N)
    wx = w[:, offs[:, 0], 0].T  # w[:, i, 0] gathered at static offsets
    wy = w[:, offs[:, 1], 1].T
    wz = w[:, offs[:, 2], 2].T
    dwx = dw[:, offs[:, 0], 0].T
    dwy = dw[:, offs[:, 1], 1].T
    dwz = dw[:, offs[:, 2], 2].T

    weight = wx * wy * wz  # (27, N)
    dweight = jnp.stack(
        [dwx * wy * wz, wx * dwy * wz, wx * wy * dwz], axis=-1
    ) * inv_dx  # (27, N, 3)

    # dpos = (offset - fx) * dx : (27, N, 3)
    dpos = (offs[:, None, :].astype(jnp.float32) - fx[None, :, :]) * dx

    # momentum contribution: weight * m * (v + C @ dpos) + dt * (-vol stress) @ dweight
    v_aff = state.v[None] + mat3.mat_vec(C[None], dpos)
    mom = weight[..., None] * (mass[None, :, None] * v_aff) + mat3.mat_vec(
        stress_scaled[None], dweight
    ) * active[None, :, None]
    m_add = weight * mass[None]

    # flat scatter indices with bounds clamp (out-of-grid contributions dropped)
    cell = base[None, :, :] + offs[:, None, :]  # (27, N, 3)
    in_bounds = jnp.all((cell >= 0) & (cell < g), axis=-1)
    cellc = jnp.clip(cell, 0, g - 1)
    flat = (cellc[..., 0] * g + cellc[..., 1]) * g + cellc[..., 2]  # (27, N)

    vals = jnp.concatenate([mom, m_add[..., None]], axis=-1)  # (27, N, 4)
    vals = jnp.where(in_bounds[..., None], vals, 0.0)

    # Materialize updates before the scatter: inside lax.scan XLA otherwise
    # fuses the whole P2G math into the scatter update region, which executes
    # ~1000x slower (measured 37ms vs 0.03ms per substep).
    flat_flat, vals_flat = jax.lax.optimization_barrier(
        (flat.reshape(-1), vals.reshape(-1, 4))
    )
    grid = jnp.zeros((g * g * g, 4), jnp.float32)
    grid = grid.at[flat_flat].add(vals_flat)
    return grid.reshape(g, g, g, 4)


def grid_momentum_to_velocity(grid, cfg: MPMConfig, dt) -> jnp.ndarray:
    """Momentum -> velocity + gravity + damping; channel-last, shape-agnostic
    (grid_normalization_and_gravity, mpm_utils.py:398-409; damping
    mpm_utils.py:583-588)."""
    m = grid[..., 3]
    mom = grid[..., :3]
    gravity = jnp.asarray(cfg.gravity, jnp.float32)
    nonempty = m > 1e-15
    v_out = jnp.where(
        nonempty[..., None],
        mom / jnp.maximum(m, 1e-15)[..., None] + dt * gravity,
        0.0,
    )
    if cfg.grid_v_damping_scale < 1.0:
        v_out = v_out * cfg.grid_v_damping_scale
    return v_out


def apply_grid_bcs(v_out, node_x, cfg: MPMConfig, dt, time, bcs: Sequence):
    """Grid BCs in insertion order; shape-agnostic over leading dims
    (grid_postprocess list, mpm_solver_warp.py:604-621)."""
    for b in bcs:
        if isinstance(b, bc_mod.GRID_BC_TYPES):
            v_out = b.apply(time, dt, v_out, node_x, cfg)
    return v_out


def grid_update(grid, cfg: MPMConfig, dt, time, bcs: Sequence) -> jnp.ndarray:
    """Momentum -> velocity, gravity, damping, grid BCs on the linear grid."""
    g = cfg.n_grid
    v_out = grid_momentum_to_velocity(grid, cfg, dt)
    if any(isinstance(b, bc_mod.GRID_BC_TYPES) for b in bcs):
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(
            jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1
        )  # (G,G,G,3)
        v_out = apply_grid_bcs(v_out, node_x, cfg, dt, time, bcs)
    return v_out


def g2p(state: MPMState, grid_v, cfg: MPMConfig, dt) -> MPMState:
    """Grid-to-particle gather: velocity, affine C, advection, F_trial update,
    optional covariance transport (g2p, mpm_utils.py:412-463)."""
    g = cfg.n_grid
    inv_dx = cfg.inv_dx

    base, fx, w, dw = _spline_weights(state.x, inv_dx)
    offs = jnp.asarray(_OFFSETS)

    wx = w[:, offs[:, 0], 0].T
    wy = w[:, offs[:, 1], 1].T
    wz = w[:, offs[:, 2], 2].T
    dwx = dw[:, offs[:, 0], 0].T
    dwy = dw[:, offs[:, 1], 1].T
    dwz = dw[:, offs[:, 2], 2].T
    weight = wx * wy * wz  # (27,N)
    dweight = jnp.stack([dwx * wy * wz, wx * dwy * wz, wx * wy * dwz], axis=-1) * inv_dx

    cell = base[None, :, :] + offs[:, None, :]
    in_bounds = jnp.all((cell >= 0) & (cell < g), axis=-1)
    cellc = jnp.clip(cell, 0, g - 1)
    flat = (cellc[..., 0] * g + cellc[..., 1]) * g + cellc[..., 2]

    gv = grid_v.reshape(-1, 3)[flat]  # (27, N, 3)
    gv = jnp.where(in_bounds[..., None], gv, 0.0)

    new_v = jnp.sum(weight[..., None] * gv, axis=0)
    # dpos here is unitless (offset - fx): g2p uses inv_dx*4 scaling
    dpos = offs[:, None, :].astype(jnp.float32) - fx[None, :, :]
    wgv = weight[..., None] * gv  # (27,N,3)
    new_C = jnp.sum(mat3.outer(wgv, dpos), axis=0) * (inv_dx * 4.0)
    grad_v = jnp.sum(mat3.outer(gv, dweight), axis=0)

    x_new = state.x + dt * new_v
    eye = jnp.eye(3, dtype=jnp.float32)
    F_trial_new = mat3.matmul(eye[None] + grad_v * dt, state.F)

    active = (state.selection == 0)
    am = active[:, None]
    amm = active[:, None, None]
    out = state.replace(
        v=jnp.where(am, new_v, state.v),
        x=jnp.where(am, x_new, state.x),
        C=jnp.where(amm, new_C, state.C),
        F_trial=jnp.where(amm, F_trial_new, state.F_trial),
    )
    if cfg.update_cov_with_F:
        cov = _update_cov(state.cov, grad_v, dt)
        out = out.replace(cov=jnp.where(am, cov, state.cov))
    return out


def _unpack_cov(cov6):
    c = cov6
    return jnp.stack(
        [
            jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
            jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
            jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
        ],
        -2,
    )


def _pack_cov(m):
    return jnp.stack(
        [m[:, 0, 0], m[:, 0, 1], m[:, 0, 2], m[:, 1, 1], m[:, 1, 2], m[:, 2, 2]], -1
    )


def _update_cov(cov6, grad_v, dt):
    """cov += dt (grad_v cov + cov grad_v^T) (update_cov, mpm_utils.py:316-335)."""
    cov = _unpack_cov(cov6)
    gc = mat3.matmul(grad_v, cov)
    cov_new = cov + dt * (gc + jnp.swapaxes(gc, -1, -2))
    return _pack_cov(cov_new)


def compute_cov_from_F(state: MPMState) -> jnp.ndarray:
    """cov = F_trial init_cov F_trial^T (compute_cov_from_F, mpm_utils.py:529-553)."""
    f = state.F_trial
    cov = _unpack_cov(state.init_cov)
    out = mat3.matmul_nt(mat3.matmul(f, cov), f)
    return _pack_cov(out)


def compute_R_from_F(state: MPMState) -> jnp.ndarray:
    """Polar rotation R^T from F_trial (compute_R_from_F, mpm_utils.py:556-580).
    Returns (N,3,3) R^T as the reference stores particle_R transposed."""
    u, _, v = svd3(state.F_trial)
    r = mat3.matmul_nt(u, v)
    return jnp.swapaxes(r, -1, -2)


# ---------------------------------------------------------------------------
# Substep and frame drivers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def p2g2p(state: MPMState, cfg: MPMConfig, bcs, time, dt) -> MPMState:
    """One explicit MPM substep (p2g2p, mpm_solver_warp.py:514-637)."""
    # particle-space BCs (impulses, velocity modifiers) before P2G
    for b in bcs:
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            state = b.apply(time, dt, state)

    state = compute_stress_from_F_trial(state, cfg, dt)
    grid = p2g(state, cfg, dt)
    grid_v = grid_update(grid, cfg, dt, time, bcs)
    state = g2p(state, grid_v, cfg, dt)
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "n_substeps"))
def simulate_substeps(state: MPMState, cfg: MPMConfig, bcs, time0, dt,
                      n_substeps: int) -> MPMState:
    """Run n_substeps in a single lax.scan (one XLA program, no host sync)."""

    def body(carry, step):
        st = carry
        t = time0 + step.astype(jnp.float32) * dt
        # inline the substep body (avoid nested jit)
        for b in bcs:
            if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
                st = b.apply(t, dt, st)
        st = compute_stress_from_F_trial(st, cfg, dt)
        grid = p2g(st, cfg, dt)
        grid_v = grid_update(grid, cfg, dt, t, bcs)
        st = g2p(st, grid_v, cfg, dt)
        return st, None

    state, _ = jax.lax.scan(body, state, jnp.arange(n_substeps))
    return state


class MPMSolver:
    """Object-style facade mirroring MPM_Simulator_WARP's API on top of the
    functional core — convenient for pipeline code and parity tests."""

    def __init__(self, n_particles=0, n_grid=100, grid_lim=1.0):
        self.cfg = MPMConfig(n_grid=n_grid, grid_lim=grid_lim)
        self.state: MPMState | None = None
        self.bcs: list = []
        self.time = 0.0
        self._param_cache: dict = {}

    # -- setup (load_initial_data_from_torch, mpm_solver_warp.py:234-281) ----
    def load_initial_data(self, x, vol, cov=None, n_grid=100, grid_lim=1.0):
        self.cfg = MPMConfig(n_grid=int(n_grid), grid_lim=float(grid_lim))
        self.state = make_state(x, vol, init_cov=cov)
        self.time = 0.0
        self.bcs = []
        self.n_particles = int(np.asarray(x).shape[0])

    def set_parameters_dict(self, kwargs: dict):
        """Mirror set_parameters_dict (mpm_solver_warp.py:287-463)."""
        from pixie_tpu.sim.types import get_material_id  # noqa: PLC0415

        st = self.state
        cfg_updates: dict = {}
        if "material" in kwargs:
            mat_id = get_material_id(kwargs["material"])
            if mat_id == -1:
                raise TypeError("Undefined material type")
            st = st.replace(
                material=jnp.full((st.n_particles,), mat_id, jnp.int32)
            )
        if "grid_lim" in kwargs:
            cfg_updates["grid_lim"] = float(kwargs["grid_lim"])
        if "n_grid" in kwargs:
            cfg_updates["n_grid"] = int(kwargs["n_grid"])
        for key in ("E", "nu"):
            if key in kwargs:
                st = st.replace(**{key: jnp.full((st.n_particles,), float(kwargs[key]), jnp.float32)})
        if "bulk_modulus" in kwargs:
            st = st.replace(bulk=jnp.full((st.n_particles,), float(kwargs["bulk_modulus"]), jnp.float32))
        if "yield_stress" in kwargs:
            st = st.replace(yield_stress=jnp.full((st.n_particles,), float(kwargs["yield_stress"]), jnp.float32))
        if "hardening" in kwargs:
            cfg_updates["hardening"] = float(kwargs["hardening"])
        if "xi" in kwargs:
            cfg_updates["xi"] = float(kwargs["xi"])
        if "friction_angle" in kwargs:
            cfg_updates["friction_angle"] = float(kwargs["friction_angle"])
        if "g" in kwargs:
            cfg_updates["gravity"] = tuple(float(v) for v in kwargs["g"])
        if "density" in kwargs:
            dens = jnp.full((st.n_particles,), float(kwargs["density"]), jnp.float32)
            st = st.replace(density=dens, mass=dens * st.vol)
        if "rpic_damping" in kwargs:
            cfg_updates["rpic_damping"] = float(kwargs["rpic_damping"])
        if "plastic_viscosity" in kwargs:
            cfg_updates["plastic_viscosity"] = float(kwargs["plastic_viscosity"])
        if "softening" in kwargs:
            cfg_updates["softening"] = float(kwargs["softening"])
        if "grid_v_damping_scale" in kwargs:
            cfg_updates["grid_v_damping_scale"] = float(kwargs["grid_v_damping_scale"])

        if "additional_material_params" in kwargs:
            for params in kwargs["additional_material_params"]:
                st = apply_additional_params(st, params)
            st = st.replace(mass=st.density * st.vol)

        if cfg_updates:
            import dataclasses
            self.cfg = dataclasses.replace(self.cfg, **cfg_updates)
        self.state = st
        self._refresh_active_materials()

    def set_per_particle_materials(self, density, E, nu, material_id):
        """Vectorized material-field assignment (replaces the reference's
        O(N) apply_additional_params kernel launches, material_field.py:343-363)."""
        st = self.state
        n = st.n_particles
        as_f = lambda a: jnp.broadcast_to(jnp.asarray(a, jnp.float32), (n,))
        dens = as_f(density)
        self.state = st.replace(
            density=dens,
            mass=dens * st.vol,
            E=as_f(E),
            nu=as_f(nu),
            material=jnp.broadcast_to(jnp.asarray(material_id, jnp.int32), (n,)),
        )
        self._refresh_active_materials()

    def _refresh_active_materials(self):
        import dataclasses
        mats = tuple(sorted(int(m) for m in np.unique(np.asarray(self.state.material))))
        self.cfg = dataclasses.replace(self.cfg, active_materials=mats)

    def finalize_mu_lam(self):
        self.state = finalize_mu_lam(self.state)

    # -- BCs -----------------------------------------------------------------
    def add_surface_collider(self, point, normal, surface="sticky", friction=0.0,
                             start_time=0.0, end_time=999.0):
        self.bcs.append(
            bc_mod.make_surface_collider(point, normal, surface, friction,
                                         start_time, end_time)
        )

    def set_velocity_on_cuboid(self, point, size, velocity, start_time=0.0,
                               end_time=999.0, reset=0):
        self.bcs.append(
            bc_mod.make_cuboid_velocity(point, size, velocity, start_time,
                                        end_time, reset)
        )

    def add_bounding_box(self, start_time=0.0, end_time=999.0):
        self.bcs.append(bc_mod.BoundingBox(start_time=start_time, end_time=end_time))

    def add_impulse_on_particles(self, force, dt, point=(1, 1, 1), size=(1, 1, 1),
                                 num_dt=1, start_time=0.0):
        self.bcs.append(
            bc_mod.make_particle_impulse(
                np.asarray(self.state.x), force, dt, point, size, num_dt, start_time
            )
        )

    def enforce_particle_velocity_translation(self, point, size, velocity,
                                              start_time, end_time):
        self.bcs.append(
            bc_mod.make_particle_translation(
                np.asarray(self.state.x), point, size, velocity, start_time, end_time
            )
        )

    def enforce_particle_velocity_rotation(self, point, normal,
                                           half_height_and_radius, rotation_scale,
                                           translation_scale, start_time, end_time):
        self.bcs.append(
            bc_mod.make_particle_rotation(
                np.asarray(self.state.x), point, normal, half_height_and_radius,
                rotation_scale, translation_scale, start_time, end_time,
            )
        )

    def release_particles_sequentially(self, normal, start_position, end_position,
                                       num_layers, start_time, end_time):
        self.bcs.extend(
            bc_mod.make_release_sequential(
                np.asarray(self.state.x), normal, start_position, end_position,
                num_layers, start_time, end_time,
            )
        )

    # -- stepping ------------------------------------------------------------
    def p2g2p(self, step, dt):
        self.state = p2g2p(self.state, self.cfg, tuple(self.bcs),
                           jnp.float32(self.time), jnp.float32(dt))
        self.time += dt

    def step_frame(self, n_substeps: int, dt: float):
        """Advance one frame of n_substeps in a single compiled scan."""
        self.state = simulate_substeps(
            self.state, self.cfg, tuple(self.bcs), jnp.float32(self.time),
            jnp.float32(dt), n_substeps,
        )
        self.time += n_substeps * dt

    # -- exports (export_particle_*_to_torch equivalents) ---------------------
    def export_particle_x(self):
        return np.asarray(self.state.x)

    def export_particle_v(self):
        return np.asarray(self.state.v)

    def export_particle_F(self):
        return np.asarray(self.state.F).reshape(-1, 9)

    def export_particle_R(self):
        return np.asarray(compute_R_from_F(self.state)).reshape(-1, 9)

    def export_particle_cov(self):
        if not self.cfg.update_cov_with_F:
            cov = compute_cov_from_F(self.state)
            self.state = self.state.replace(cov=cov)
        return np.asarray(self.state.cov)


def apply_additional_params(state: MPMState, params: dict) -> MPMState:
    """Box-region material override (apply_additional_params, mpm_utils.py:591-610)."""
    from pixie_tpu.sim.types import get_material_id  # noqa: PLC0415

    point = jnp.asarray(params["point"], jnp.float32)
    size = jnp.asarray(params["size"], jnp.float32)
    inside = jnp.all(
        (state.x > point - size) & (state.x < point + size), axis=-1
    )
    mat = params["material"]
    mat = get_material_id(mat) if isinstance(mat, str) else int(mat)
    return state.replace(
        E=jnp.where(inside, float(params["E"]), state.E),
        nu=jnp.where(inside, float(params["nu"]), state.nu),
        density=jnp.where(inside, float(params["density"]), state.density),
        material=jnp.where(inside, mat, state.material),
    )
