"""Boundary conditions as a static, jit-compatible schema.

The reference builds Warp kernel *closures* at runtime and launches them each
substep (mpm_solver_warp.py:749-1211).  That pattern cannot exist under jit;
instead each BC is a small pytree struct (arrays traced, type tags static) and
the solver applies the BC list in a fixed order inside the compiled step.
Time gating uses jnp.where on the traced simulation time.

Covered BC types (decode_param.py:277-396):
  surface_collider, cuboid (set_velocity_on_cuboid, incl. moving + reset),
  bounding_box, particle_impulse, enforce_particle_translation,
  enforce_particle_velocity_rotation, release_particles_sequentially.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


# ---------------------------------------------------------------------------
# Grid BCs
# ---------------------------------------------------------------------------

@struct.dataclass
class SurfaceCollider:
    """Half-space collider (add_surface_collider, mpm_solver_warp.py:749-843).

    surface types: 0=sticky, 1=slip, 2=frictional, 11=cut.
    NOTE: this PhysGaussian fork zeroes grid velocity for slip/frictional
    surfaces after computing the projected velocity (mpm_solver_warp.py:838-840)
    — i.e. they behave like sticky.  We reproduce that for parity; set
    ``legacy_zero_velocity=False`` for the original PhysGaussian projection.
    """

    point: jnp.ndarray
    normal: jnp.ndarray
    surface_type: int = struct.field(pytree_node=False, default=0)
    friction: float = struct.field(pytree_node=False, default=0.0)
    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=999.0)
    legacy_zero_velocity: bool = struct.field(pytree_node=False, default=True)

    def apply(self, time, dt, grid_v, node_x, cfg):
        offset = node_x - self.point
        dotproduct = jnp.einsum("...i,i->...", offset, self.normal)
        inside = dotproduct < 0.0

        if self.surface_type == 0:
            v_new = jnp.zeros_like(grid_v)
        elif self.surface_type == 11:  # cut
            z = node_x[..., 2]
            outside_slab = (z < 0.4) | (z > 0.53)
            damped = grid_v.at[..., 1].set(0.0) * 0.3
            v_new = jnp.where(outside_slab[..., None], 0.0, damped)
        else:
            n = self.normal
            normal_component = jnp.einsum("...i,i->...", grid_v, n)
            if self.surface_type == 1:  # slip: project out all normal
                v_proj = grid_v - normal_component[..., None] * n
            else:  # frictional: project out inward normal only
                v_proj = grid_v - jnp.minimum(normal_component, 0.0)[..., None] * n
            v_len = jnp.linalg.norm(v_proj, axis=-1)
            fric_scale = jnp.maximum(0.0, v_len + normal_component * self.friction)
            v_fric = jnp.where(
                ((normal_component < 0.0) & (v_len > 1e-20))[..., None],
                fric_scale[..., None] * v_proj / jnp.maximum(v_len, 1e-20)[..., None],
                v_proj,
            )
            if self.legacy_zero_velocity:
                v_new = jnp.zeros_like(grid_v)
            else:
                v_new = v_fric

        active = (time >= self.start_time) & (time < self.end_time)
        return jnp.where((active & inside)[..., None], v_new, grid_v)


@struct.dataclass
class CuboidVelocity:
    """Velocity Dirichlet cuboid, optionally moving with its own velocity
    (set_velocity_on_cuboid, mpm_solver_warp.py:853-908).

    The reference advances ``point`` by dt*velocity after each active substep;
    the closed form point(t) = point0 + velocity * (clip(t,start,end) - start)
    reproduces that trajectory.  reset=1 zeroes the region's velocity for
    15 dt after end_time (mpm_solver_warp.py:895-897).
    """

    point: jnp.ndarray
    size: jnp.ndarray
    velocity: jnp.ndarray
    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=999.0)
    reset: int = struct.field(pytree_node=False, default=0)

    def apply(self, time, dt, grid_v, node_x, cfg):
        travel = jnp.clip(time, self.start_time, self.end_time) - self.start_time
        point = self.point + self.velocity * travel
        offset = jnp.abs(node_x - point)
        inside = jnp.all(offset < self.size, axis=-1)

        active = (time >= self.start_time) & (time < self.end_time)
        out = jnp.where(
            (active & inside)[..., None], self.velocity, grid_v
        )
        if self.reset == 1:
            in_reset = (~active) & (time < self.end_time + 15.0 * dt)
            # reference zeroes the WHOLE grid in the reset window
            # (mpm_solver_warp.py:895-897 has no spatial test in that branch)
            out = jnp.where(in_reset, jnp.zeros_like(out), out)
        return out


@struct.dataclass
class BoundingBox:
    """Outward-velocity clamp at the domain faces, padding=3 cells
    (add_bounding_box, mpm_solver_warp.py:910-977)."""

    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=999.0)

    def apply(self, time, dt, grid_v, node_x, cfg):
        padding = 3
        n = cfg.n_grid
        # node indices from coordinates: shape-agnostic (works for both the
        # linear (G,G,G,3) and tile-blocked layouts)
        idx = jnp.round(node_x * cfg.inv_dx).astype(jnp.int32)
        low = idx < padding
        high = idx >= n - padding

        vx, vy, vz = grid_v[..., 0], grid_v[..., 1], grid_v[..., 2]
        vx = jnp.where(low[..., 0] & (vx < 0), 0.0, vx)
        vx = jnp.where(high[..., 0] & (vx > 0), 0.0, vx)
        vy = jnp.where(low[..., 1] & (vy < 0), 0.0, vy)
        vy = jnp.where(high[..., 1] & (vy > 0), 0.0, vy)
        vz = jnp.where(low[..., 2] & (vz < 0), 0.0, vz)
        vz = jnp.where(high[..., 2] & (vz > 0), 0.0, vz)
        out = jnp.stack([vx, vy, vz], axis=-1)

        active = (time >= self.start_time) & (time < self.end_time)
        return jnp.where(active, out, grid_v)


# ---------------------------------------------------------------------------
# Particle BCs (pre-P2G)
# ---------------------------------------------------------------------------

@struct.dataclass
class ParticleImpulse:
    """v += force/mass * dt while active (add_impulse_on_particles,
    mpm_solver_warp.py:982-1029).  mask selected from initial positions."""

    force: jnp.ndarray
    mask: jnp.ndarray  # (N,) 0/1
    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=0.0)

    def apply(self, time, dt, state):
        active = (time >= self.start_time) & (time < self.end_time)
        impulse = self.force[None, :] / state.mass[:, None] * dt
        v_new = state.v + impulse
        sel = active & (self.mask > 0)
        return state.replace(v=jnp.where(sel[:, None], v_new, state.v))


@struct.dataclass
class ParticleVelocityTranslation:
    """Dirichlet particle velocity in a box (enforce_particle_velocity_translation,
    mpm_solver_warp.py:1031-1075)."""

    velocity: jnp.ndarray
    mask: jnp.ndarray
    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=999.0)

    def apply(self, time, dt, state):
        active = (time >= self.start_time) & (time < self.end_time)
        sel = active & (self.mask > 0)
        return state.replace(
            v=jnp.where(sel[:, None], self.velocity[None, :], state.v)
        )


@struct.dataclass
class ParticleVelocityRotation:
    """Rotate particles in a cylinder about ``normal``
    (enforce_particle_velocity_rotation, mpm_solver_warp.py:1080-1181)."""

    point: jnp.ndarray
    normal: jnp.ndarray
    horizontal_axis_1: jnp.ndarray
    horizontal_axis_2: jnp.ndarray
    mask: jnp.ndarray
    rotation_scale: float = struct.field(pytree_node=False, default=1.0)
    translation_scale: float = struct.field(pytree_node=False, default=0.0)
    start_time: float = struct.field(pytree_node=False, default=0.0)
    end_time: float = struct.field(pytree_node=False, default=999.0)

    def apply(self, time, dt, state):
        offset = state.x - self.point
        along = jnp.einsum("ni,i->n", offset, self.normal)
        radial = offset - along[:, None] * self.normal
        horiz_dist = jnp.linalg.norm(radial, axis=-1)
        cosine = jnp.einsum("ni,i->n", offset, self.horizontal_axis_1) / jnp.maximum(
            horiz_dist, 1e-12
        )
        theta = jnp.arccos(jnp.clip(cosine, -1.0, 1.0))
        theta = jnp.where(
            jnp.einsum("ni,i->n", offset, self.horizontal_axis_2) > 0, theta, -theta
        )
        a1 = -horiz_dist * jnp.sin(theta) * self.rotation_scale
        a2 = horiz_dist * jnp.cos(theta) * self.rotation_scale
        v_new = (
            a1[:, None] * self.horizontal_axis_1
            + a2[:, None] * self.horizontal_axis_2
            + self.translation_scale * self.normal[None, :]
        )
        active = (time >= self.start_time) & (time < self.end_time)
        sel = active & (self.mask > 0)
        return state.replace(v=jnp.where(sel[:, None], v_new, state.v))


GRID_BC_TYPES = (SurfaceCollider, CuboidVelocity, BoundingBox)
PARTICLE_BC_TYPES = (ParticleImpulse, ParticleVelocityTranslation, ParticleVelocityRotation)


# ---------------------------------------------------------------------------
# Setup helpers (host-side, mirror the solver's add_* methods)
# ---------------------------------------------------------------------------

def _normalize_np(v):
    v = np.asarray(v, np.float32)
    return v / np.sqrt((v**2).sum())


def make_surface_collider(point, normal, surface="sticky", friction=0.0,
                          start_time=0.0, end_time=999.0):
    if surface == "sticky" and friction != 0:
        raise ValueError("friction must be 0 on sticky surfaces.")
    surface_type = {"sticky": 0, "slip": 1, "cut": 11}.get(surface, 2)
    return SurfaceCollider(
        point=jnp.asarray(point, jnp.float32),
        normal=jnp.asarray(_normalize_np(normal)),
        surface_type=surface_type,
        friction=float(friction),
        start_time=float(start_time),
        end_time=float(end_time),
    )


def make_cuboid_velocity(point, size, velocity, start_time=0.0, end_time=999.0, reset=0):
    return CuboidVelocity(
        point=jnp.asarray(point, jnp.float32),
        size=jnp.asarray(size, jnp.float32),
        velocity=jnp.asarray(velocity, jnp.float32),
        start_time=float(start_time),
        end_time=float(end_time),
        reset=int(reset),
    )


def make_particle_impulse(positions, force, dt, point=(1, 1, 1), size=(1, 1, 1),
                          num_dt=1, start_time=0.0):
    offset = np.abs(np.asarray(positions) - np.asarray(point))
    mask = np.all(offset < np.asarray(size), axis=-1).astype(np.int32)
    return ParticleImpulse(
        force=jnp.asarray(force, jnp.float32),
        mask=jnp.asarray(mask),
        start_time=float(start_time),
        end_time=float(start_time + dt * num_dt),
    )


def make_particle_translation(positions, point, size, velocity, start_time, end_time):
    offset = np.abs(np.asarray(positions) - np.asarray(point))
    mask = np.all(offset < np.asarray(size), axis=-1).astype(np.int32)
    return ParticleVelocityTranslation(
        velocity=jnp.asarray(velocity, jnp.float32),
        mask=jnp.asarray(mask),
        start_time=float(start_time),
        end_time=float(end_time),
    )


def make_particle_rotation(positions, point, normal, half_height_and_radius,
                           rotation_scale, translation_scale, start_time, end_time):
    normal = _normalize_np(normal)
    h1 = np.array([1.0, 1.0, 1.0], np.float32)
    if abs(float(np.dot(normal, h1))) < 0.01:
        h1 = np.array([0.72, 0.37, -0.67], np.float32)
    h1 = h1 - np.dot(h1, normal) * normal
    h1 = h1 / np.linalg.norm(h1)
    h2 = np.cross(h1, normal)

    offset = np.asarray(positions) - np.asarray(point)
    vert = np.abs(offset @ normal)
    horiz = np.linalg.norm(offset - np.outer(offset @ normal, normal), axis=-1)
    mask = (
        (vert < half_height_and_radius[0]) & (horiz < half_height_and_radius[1])
    ).astype(np.int32)
    return ParticleVelocityRotation(
        point=jnp.asarray(point, jnp.float32),
        normal=jnp.asarray(normal),
        horizontal_axis_1=jnp.asarray(h1),
        horizontal_axis_2=jnp.asarray(h2),
        mask=jnp.asarray(mask),
        rotation_scale=float(rotation_scale),
        translation_scale=float(translation_scale),
        start_time=float(start_time),
        end_time=float(end_time),
    )


def make_release_sequential(positions, normal, start_position, end_position,
                            num_layers, start_time, end_time):
    """release_particles_sequentially (mpm_solver_warp.py:1185-1210).
    NOTE: the reference hard-codes num_layers = 50 regardless of the argument;
    we reproduce that."""
    num_layers = 50
    point = [0.0, 0.0, 0.0]
    size = [0.0, 0.0, 0.0]
    axis = -1
    for i in range(3):
        if normal[i] == 0:
            point[i] = 1.0
            size[i] = 1.0
        else:
            axis = i
            point[i] = float(end_position)
    half = abs(start_position - end_position) / num_layers
    end_portion = end_time / num_layers
    bcs = []
    for i in range(num_layers):
        size[axis] = half * (num_layers - i)
        bcs.append(
            make_particle_translation(
                positions, point, list(size), [0.0, 0.0, 0.0],
                start_time, end_portion * (i + 1),
            )
        )
    return bcs


def build_boundary_conditions(bc_params: Sequence[dict], time_params: dict,
                              positions: np.ndarray) -> tuple:
    """JSON BC list -> BC structs (set_boundary_conditions, decode_param.py:277-396)."""
    bcs: list = []
    for bc in bc_params:
        t = bc["type"]
        if t == "cuboid":
            bcs.append(
                make_cuboid_velocity(
                    bc["point"], bc["size"], bc["velocity"],
                    bc.get("start_time", 0.0), bc.get("end_time", 1e3),
                    bc.get("reset", 0),
                )
            )
        elif t == "particle_impulse":
            bcs.append(
                make_particle_impulse(
                    positions, bc["force"], time_params["substep_dt"],
                    bc.get("point", [1, 1, 1]), bc.get("size", [1, 1, 1]),
                    bc.get("num_dt", 1), bc.get("start_time", 0.0),
                )
            )
        elif t == "bounding_box":
            bcs.append(BoundingBox())
        elif t == "enforce_particle_translation":
            bcs.append(
                make_particle_translation(
                    positions, bc["point"], bc["size"], bc["velocity"],
                    bc["start_time"], bc["end_time"],
                )
            )
        elif t == "surface_collider":
            bcs.append(
                make_surface_collider(
                    bc["point"], bc["normal"], bc["surface"], bc["friction"],
                    bc["start_time"], bc["end_time"],
                )
            )
        elif t == "release_particles_sequentially":
            bcs.extend(
                make_release_sequential(
                    positions, bc["normal"], bc["start_position"],
                    bc["end_position"], bc["num_layers"],
                    bc["start_time"], bc["end_time"],
                )
            )
        elif t == "enforce_particle_velocity_rotation":
            bcs.append(
                make_particle_rotation(
                    positions, bc["point"], bc["normal"],
                    bc["half_height_and_radius"], bc["rotation_scale"],
                    bc["translation_scale"], bc["start_time"], bc["end_time"],
                )
            )
        else:
            raise TypeError(f"Undefined BC type {t!r}")
    return tuple(bcs)
