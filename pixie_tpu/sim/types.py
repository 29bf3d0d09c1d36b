"""MPM state/model containers as JAX pytrees.

Mirrors the reference's SoA layout (mpm_solver_warp/warp_utils.py:6-74:
MPMStateStruct / MPMModelStruct) but split the TPU-native way:

  * ``MPMState``   — everything that evolves during the rollout, including the
    per-particle material parameters that plasticity mutates (yield_stress,
    mu, lam; see von_mises_return_mapping_with_damage, mpm_utils.py:138-191).
    A flax.struct pytree: flows through jit/scan/shard_map.
  * ``MPMConfig``  — static scalars (grid size, dt-independent switches).
    Hashable frozen dataclass: a static jit argument, so XLA specializes the
    compiled program (grid shapes, material set, damping mode) at trace time.

Grid arrays are not stored in the state: each substep materializes them
functionally (zero_grid is free under XLA; reference zeroes explicitly,
mpm_utils.py:295-300).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

# Material taxonomy (mpm_solver_warp.py:10-26)
MATERIAL_ID_TO_NAME = {
    0: "jelly",
    1: "metal",
    2: "sand",
    3: "visplas",
    4: "fluid",
    5: "snow",
    6: "stationary",
}
EXCLUDED_MATERIAL_NAMES = ("visplas", "fluid")
NAME_TO_MATERIAL_ID = {
    name: i
    for i, name in MATERIAL_ID_TO_NAME.items()
    if name not in EXCLUDED_MATERIAL_NAMES
}
NAME_TO_MATERIAL_ID.update({"elastic": 0, "rigid": 6})


def get_material_id(name_or_id) -> int:
    """Material name -> id (mpm_solver_warp.py:29-45). Ints pass through."""
    if isinstance(name_or_id, (int, np.integer)):
        return int(name_or_id)
    return NAME_TO_MATERIAL_ID.get(name_or_id, -1)


@struct.dataclass
class MPMState:
    """Per-particle simulation state (all fp32 except integer tags)."""

    x: jnp.ndarray          # (N,3) position in grid space [0, grid_lim]^3
    v: jnp.ndarray          # (N,3) velocity
    F: jnp.ndarray          # (N,3,3) elastic deformation gradient
    F_trial: jnp.ndarray    # (N,3,3) trial deformation gradient (pre return-map)
    C: jnp.ndarray          # (N,3,3) affine velocity field (APIC)
    stress: jnp.ndarray     # (N,3,3) Kirchhoff stress
    init_cov: jnp.ndarray   # (N,6) initial covariance (upper-triangular packed)
    cov: jnp.ndarray        # (N,6) current covariance
    vol: jnp.ndarray        # (N,) particle volume
    mass: jnp.ndarray       # (N,) particle mass
    density: jnp.ndarray    # (N,) particle density
    material: jnp.ndarray   # (N,) int32 material id
    selection: jnp.ndarray  # (N,) int32; only selection==0 simulated
    Jp: jnp.ndarray         # (N,) plastic volume ratio (reserved)

    # Per-particle material parameters (reference keeps them in MPMModelStruct
    # but mutates them in kernels; functionally they are state).
    E: jnp.ndarray            # (N,) Young's modulus
    nu: jnp.ndarray           # (N,) Poisson ratio
    mu: jnp.ndarray           # (N,) first Lame
    lam: jnp.ndarray          # (N,) second Lame
    bulk: jnp.ndarray         # (N,) bulk modulus (fluid)
    yield_stress: jnp.ndarray # (N,)

    @property
    def n_particles(self) -> int:
        return self.x.shape[0]


@dataclasses.dataclass(frozen=True)
class MPMConfig:
    """Static solver configuration (hashable -> jit-static).

    Defaults mirror MPM_Simulator_WARP.initialize / set_parameters_dict
    (mpm_solver_warp.py:52-92, 287-433) and decode_param.py defaults.
    """

    n_grid: int = 50
    grid_lim: float = 2.0
    gravity: tuple[float, float, float] = (0.0, 0.0, 0.0)
    rpic_damping: float = 0.0          # 0 = APIC, >0 = RPIC blend, <0 = PIC
    grid_v_damping_scale: float = 1.1  # applied only when < 1.0
    update_cov_with_F: bool = False

    # plasticity scalars
    hardening: float = 0.0
    xi: float = 0.0
    friction_angle: float = 25.0
    plastic_viscosity: float = 0.0
    softening: float = 0.1

    # which materials are present (static -> dead branches compile away)
    active_materials: tuple[int, ...] = (0,)

    @property
    def dx(self) -> float:
        return self.grid_lim / self.n_grid

    @property
    def inv_dx(self) -> float:
        return self.n_grid / self.grid_lim

    @property
    def alpha(self) -> float:
        """Drucker-Prager alpha from the friction angle (mpm_solver_warp.py:84-86)."""
        sin_phi = np.sin(self.friction_angle / 180.0 * 3.14159265)
        return float(np.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi))

    def needs_return_mapping(self) -> bool:
        return any(m in self.active_materials for m in (1, 2, 3, 5))


def make_state(
    x: Any,
    vol: Any,
    init_cov: Any | None = None,
    density: float | Any = 200.0,
    E: float | Any = 1e5,
    nu: float | Any = 0.4,
    material: int | Any = 0,
    yield_stress: float | Any = 0.0,
    bulk: float | Any = 0.0,
) -> MPMState:
    """Build an initial state (load_initial_data_from_torch semantics,
    mpm_solver_warp.py:234-281): v=0, F_trial=I, mass = density * vol."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    vol = jnp.asarray(vol, jnp.float32)

    def full_f(val):
        val = jnp.asarray(val, jnp.float32)
        return jnp.broadcast_to(val, (n,)) if val.ndim == 0 else val

    def full_i(val):
        val = jnp.asarray(val, jnp.int32)
        return jnp.broadcast_to(val, (n,)) if val.ndim == 0 else val

    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    zeros33 = jnp.zeros((n, 3, 3), jnp.float32)
    density_arr = full_f(density)
    if init_cov is None:
        init_cov = jnp.zeros((n, 6), jnp.float32)
    else:
        init_cov = jnp.asarray(init_cov, jnp.float32).reshape(n, 6)
    return MPMState(
        x=x,
        v=jnp.zeros((n, 3), jnp.float32),
        F=eye,
        F_trial=eye,
        C=zeros33,
        stress=zeros33,
        init_cov=init_cov,
        cov=init_cov,
        vol=vol,
        mass=density_arr * vol,
        density=density_arr,
        material=full_i(material),
        selection=jnp.zeros((n,), jnp.int32),
        Jp=jnp.zeros((n,), jnp.float32),
        E=full_f(E),
        nu=full_f(nu),
        mu=jnp.zeros((n,), jnp.float32),
        lam=jnp.zeros((n,), jnp.float32),
        bulk=full_f(bulk),
        yield_stress=full_f(yield_stress),
    )


def finalize_mu_lam(state: MPMState) -> MPMState:
    """E, nu -> mu, lam (compute_mu_lam_from_E_nu, mpm_utils.py:282-288) and
    bulk = lam + 2/3 mu (compute_bulk, mpm_utils.py:290-293)."""
    mu = state.E / (2.0 * (1.0 + state.nu))
    lam = state.E * state.nu / ((1.0 + state.nu) * (1.0 - 2.0 * state.nu))
    return state.replace(mu=mu, lam=lam, bulk=lam + 2.0 / 3.0 * mu)
