"""Fast MPM path: tile-sorted particles + Pallas transfer kernels.

Drop-in alternative to the scatter/gather substep in solver.py.  The particle
state lives in a tile-sorted block-padded layout (ops/tiling.py); each frame
the layout is rebuilt (amortized re-sort) and the whole frame runs as one
``lax.scan`` whose body uses the Pallas kernels in ops/transfer.py.  The
12-node windows tolerate +/-1 cell of drift between re-sorts; out-of-drift
particles are clamped to the window edge (and counted for diagnostics).

Numerics are identical to solver.p2g/g2p (see tests/test_fast_solver.py for
element-wise parity): same B-spline weights, APIC transfer, BC handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pixie_tpu.ops import tiling, transfer
from pixie_tpu.ops.tiling import PBLK, TILE, WIN_S
from pixie_tpu.sim import bc as bc_mod
from pixie_tpu.sim import mat3
from pixie_tpu.sim.constitutive import compute_stress_from_F_trial
from pixie_tpu.sim.solver import apply_grid_bcs, grid_momentum_to_velocity, grid_update
from pixie_tpu.sim.types import MPMConfig, MPMState


def pad_state_to_layout(state: MPMState, layout) -> MPMState:
    """Gather state arrays into the padded tile-sorted slot order.

    Padding slots get zero mass/volume (their transfer contributions vanish)
    and selection=1 (skipped by the constitutive update).
    """
    perm = layout["perm"]
    occ = layout["occupied"]

    def take(a):
        out = jnp.take(a, perm, axis=0)
        return out

    st = jax.tree.map(take, state)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), st.F.shape)
    occb = occ > 0
    return st.replace(
        mass=st.mass * occ,
        vol=st.vol * occ,
        selection=jnp.where(occb, st.selection, 1),
        F=jnp.where(occb[:, None, None], st.F, eye),
        F_trial=jnp.where(occb[:, None, None], st.F_trial, eye),
        E=jnp.where(occb, st.E, 1.0),
        nu=jnp.where(occb, st.nu, 0.3),
        mu=jnp.where(occb, st.mu, 1.0),
        lam=jnp.where(occb, st.lam, 1.0),
    )


def unpad_state(state_padded: MPMState, layout, n_particles: int) -> MPMState:
    """Scatter padded slots back to original particle order (for exports)."""
    perm = np.asarray(layout["perm"])
    occ = np.asarray(layout["occupied"]) > 0
    inv = np.zeros(n_particles, np.int32)
    inv[perm[occ]] = np.nonzero(occ)[0].astype(np.int32)
    inv_j = jnp.asarray(inv)

    def take(a):
        return jnp.take(a, inv_j, axis=0)

    return jax.tree.map(take, state_padded)


def _tile_coords_per_slot(layout):
    return jnp.repeat(layout["tile_coords"], PBLK, axis=0)


def windows_to_combine_layout(windows, t):
    """(T3, 4*WIN_S, WIN_S^2) -> (t,t,t, WIN_S,WIN_S,WIN_S, 4) (linear-path
    helper, used by parity tests)."""
    w = windows.reshape(t, t, t, transfer.N_GRID_CH, WIN_S, WIN_S, WIN_S)
    return jnp.moveaxis(w, 3, -1)


def grid_to_g2p_windows(grid_v, n_grid):
    """(G,G,G,3) -> (T3, 3*WIN_S, WIN_S^2) for the G2P kernel (linear path)."""
    t = tiling.n_tiles(n_grid)
    wins = tiling.extract_windows(grid_v, n_grid)  # (t,t,t,16,16,16,3)
    w = jnp.moveaxis(wins, -1, 3)  # (t,t,t,3,16,16,16)
    return w.reshape(t * t * t, 3 * WIN_S, WIN_S * WIN_S)


def _blocked_node_x(cfg: MPMConfig):
    """(t,t,t,TILE,TILE,TILE,3) node coordinates (constant, folded by jit)."""
    t = tiling.n_tiles(cfg.n_grid)
    g_pad = t * TILE
    idx = jnp.arange(g_pad, dtype=jnp.float32) * cfg.dx
    node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
    return node_x.reshape(t, TILE, t, TILE, t, TILE, 3).transpose(0, 2, 4, 1, 3, 5, 6)


def _blocked_valid_mask(cfg: MPMConfig):
    """1 for cells inside the n_grid domain, 0 for tile padding."""
    t = tiling.n_tiles(cfg.n_grid)
    g_pad = t * TILE
    idx = jnp.arange(g_pad) < cfg.n_grid
    m = idx[:, None, None] & idx[None, :, None] & idx[None, None, :]
    return m.reshape(t, TILE, t, TILE, t, TILE).transpose(0, 2, 4, 1, 3, 5)


def p2g2p_fast(state: MPMState, layout, cfg: MPMConfig, bcs, time, dt,
               interpret: bool = False) -> MPMState:
    """One substep on padded tile-sorted state (semantics of solver.p2g2p)."""
    t = tiling.n_tiles(cfg.n_grid)
    t3 = t * t * t
    tile_coords = _tile_coords_per_slot(layout)

    # particle BCs before P2G (impulses, velocity modifiers)
    for b in bcs:
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            state = b.apply(time, dt, state)

    state = compute_stress_from_F_trial(state, cfg, dt)

    # RPIC/PIC damping of C (p2g_apic_with_stress, mpm_utils.py:372-379)
    C = state.C
    if cfg.rpic_damping < -0.001:
        C = jnp.zeros_like(C)
    elif cfg.rpic_damping != 0.0:
        C = (1.0 - cfg.rpic_damping) * C + cfg.rpic_damping / 2.0 * (
            C - jnp.swapaxes(C, -1, -2)
        )

    active = (state.selection == 0).astype(jnp.float32)
    pdata = transfer.build_pdata(
        state.x, state.v, C, state.stress, state.mass * active,
        state.vol * active, tile_coords, dt, cfg.dx, cfg.inv_dx,
    )

    windows = transfer.p2g_tiled(pdata, layout["block_tile"], t3, interpret=interpret)
    # blocked-grid path: windows and grid stay tile-blocked, so combine and
    # extract are pure static slicing (no interleaving transposes)
    win_blocked = windows.reshape(
        t, t, t, transfer.N_GRID_CH, WIN_S, WIN_S, WIN_S
    )
    grid_blocked = tiling.combine_windows_blocked(win_blocked, transfer.N_GRID_CH)

    grid_cl = jnp.moveaxis(grid_blocked, 3, -1)  # channel-last (2MB, cheap)
    grid_v = grid_momentum_to_velocity(grid_cl, cfg, dt)
    if any(isinstance(b, bc_mod.GRID_BC_TYPES) for b in bcs):
        grid_v = apply_grid_bcs(grid_v, _blocked_node_x(cfg), cfg, dt, time, bcs)
    grid_v = grid_v * _blocked_valid_mask(cfg)[..., None]

    g2p_wins = tiling.extract_windows_blocked(
        jnp.moveaxis(grid_v, -1, 3)
    ).reshape(t3, transfer.N_VEL_CH * WIN_S, WIN_S * WIN_S)
    out = transfer.g2p_tiled(pdata, g2p_wins, layout["block_tile"],
                             interpret=interpret)

    new_v = jnp.stack([out[:, 0], out[:, 7], out[:, 14]], axis=-1)
    new_C = jnp.stack(
        [
            jnp.stack([out[:, c * 7 + 1 + a] for a in range(3)], axis=-1)
            for c in range(3)
        ],
        axis=-2,
    ) * (cfg.inv_dx * 4.0)
    grad_v = jnp.stack(
        [
            jnp.stack([out[:, c * 7 + 4 + a] for a in range(3)], axis=-1)
            for c in range(3)
        ],
        axis=-2,
    ) * cfg.inv_dx

    x_new = state.x + dt * new_v
    eye = jnp.eye(3, dtype=jnp.float32)
    F_trial_new = mat3.matmul(eye[None] + grad_v * dt, state.F)

    is_active = (state.selection == 0)
    am = is_active[:, None]
    amm = is_active[:, None, None]
    out_state = state.replace(
        v=jnp.where(am, new_v, state.v),
        x=jnp.where(am, x_new, state.x),
        C=jnp.where(amm, new_C, state.C),
        F_trial=jnp.where(amm, F_trial_new, state.F_trial),
    )
    if cfg.update_cov_with_F:
        from pixie_tpu.sim.solver import _update_cov  # noqa: PLC0415

        cov = _update_cov(state.cov, grad_v, dt)
        out_state = out_state.replace(cov=jnp.where(am, cov, state.cov))
    return out_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_substeps", "n_blocks", "interpret")
)
def simulate_substeps_fast(state_padded: MPMState, block_tile, tile_coords,
                           occupied, cfg: MPMConfig, bcs, time0, dt,
                           n_substeps: int, n_blocks: int,
                           interpret: bool = False) -> MPMState:
    """A frame of substeps on padded state — one compiled scan."""
    layout = {
        "block_tile": block_tile,
        "tile_coords": tile_coords,
        "occupied": occupied,
    }

    def body(st, step):
        t_now = time0 + step.astype(jnp.float32) * dt
        st = p2g2p_fast(st, layout, cfg, bcs, t_now, dt, interpret=interpret)
        return st, None

    state_padded, _ = jax.lax.scan(body, state_padded, jnp.arange(n_substeps))
    return state_padded


class FastMPMSolver:
    """Frame-oriented driver around the tiled fast path.

    Usage: construct from an MPMSolver-style compact state, then call
    step_frame(); the layout is rebuilt (resort) before each frame.
    """

    def __init__(self, state: MPMState, cfg: MPMConfig, bcs=(),
                 interpret: bool | None = None):
        self.cfg = cfg
        self.bcs = tuple(bcs)
        self.n_particles = state.n_particles
        self.time = 0.0
        # Pallas TPU kernels need interpret mode on non-TPU backends
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        self._compact_state = state
        self._layout = None
        self._padded = None
        self._compact_dirty = False

    def _resort(self):
        x = np.asarray(self._compact_state.x)
        self._layout = tiling.build_padded_layout(
            x, self.cfg.n_grid, self.cfg.inv_dx
        )
        self._padded = pad_state_to_layout(self._compact_state, self._layout)
        self._compact_dirty = False

    def _needs_resort(self) -> bool:
        """True when any occupied particle drifted beyond the +/-1 cell the
        12-node windows absorb (u0 outside [0, WIN-3])."""
        if self._padded is None:
            return True
        lay = self._layout
        base = tiling.base_cell_of(self._padded.x, self.cfg.inv_dx)
        u0 = base - jnp.repeat(lay["tile_coords"], tiling.PBLK, axis=0) * tiling.TILE + 1
        occ = lay["occupied"] > 0
        bad = jnp.any(occ[:, None] & ((u0 < 0) | (u0 > tiling.WIN - 3)))
        return bool(bad)

    def step_frame(self, n_substeps: int, dt: float):
        if self._needs_resort():
            if self._padded is not None and self._compact_dirty:
                self._compact_state = unpad_state(
                    self._padded, self._layout, self.n_particles
                )
            self._resort()
        lay = self._layout
        self._padded = simulate_substeps_fast(
            self._padded, lay["block_tile"], lay["tile_coords"],
            lay["occupied"], self.cfg, self.bcs, jnp.float32(self.time),
            jnp.float32(dt), n_substeps, lay["n_blocks"],
            interpret=self.interpret,
        )
        self.time += n_substeps * dt
        self._compact_dirty = True

    @property
    def state(self) -> MPMState:
        if self._compact_dirty:
            self._compact_state = unpad_state(
                self._padded, self._layout, self.n_particles
            )
            self._compact_dirty = False
        return self._compact_state
