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
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pixie_tpu.ops import tiling, transfer
from pixie_tpu.ops.tiling import NSLAB, PBLK, TILE, WIN_S
from pixie_tpu.sim import bc as bc_mod
from pixie_tpu.sim import soa
from pixie_tpu.sim.constitutive_soa import compute_stress_rows
from pixie_tpu.sim.solver import apply_grid_bcs, grid_momentum_to_velocity, grid_update
from pixie_tpu.sim.types import MPMConfig, MPMState

# combine/extract as constant-matrix MXU matmuls (tiling.combine_windows_mm)
# instead of minor-axis slice chains; A/B-able for perf forensics
MM_FOLD = os.environ.get("PIXIE_MM_FOLD", "1") == "1"


@jax.jit
def _pad_state_jit(state: MPMState, perm, occ) -> MPMState:
    def take(a):
        return jnp.take(a, perm, axis=0)

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


def pad_state_to_layout(state: MPMState, layout) -> MPMState:
    """Gather state arrays into the padded tile-sorted slot order.

    Padding slots get zero mass/volume (their transfer contributions vanish)
    and selection=1 (skipped by the constitutive update).  ONE jitted
    program: the eager form cost ~40 dispatches x the remote per-dispatch
    round-trip tax — 1.25 s of the r4 realscene 2.3 s resort event
    (docs/DESIGN.md); shapes are bucketed so resorts reuse the compile.
    """
    return _pad_state_jit(state, jnp.asarray(layout["perm"]),
                          jnp.asarray(layout["occupied"]))


def inverse_perm(layout, n_particles: int) -> np.ndarray:
    """(n_particles,) padded-slot index of each original particle.  Prefers
    the layout's host copies (perm_np/occupied_np) — falling back to a
    device fetch costs a multi-MB tunnel round-trip per call."""
    perm = layout.get("perm_np")
    occ = layout.get("occupied_np")
    if perm is None:
        perm = np.asarray(layout["perm"])
    if occ is None:
        occ = np.asarray(layout["occupied"])
    occ = occ > 0
    inv = np.zeros(n_particles, np.int32)
    inv[perm[occ]] = np.nonzero(occ)[0].astype(np.int32)
    return inv


@jax.jit
def _unpad_state_jit(state_padded: MPMState, inv) -> MPMState:
    return jax.tree.map(lambda a: jnp.take(a, inv, axis=0), state_padded)


def unpad_state(state_padded: MPMState, layout, n_particles: int) -> MPMState:
    """Gather padded slots back to original particle order (for exports).
    One jitted program (same dispatch-tax rationale as pad_state_to_layout)."""
    return _unpad_state_jit(state_padded,
                            jnp.asarray(inverse_perm(layout, n_particles)))


@jax.jit
def _compact_base_cells(x_padded, inv, inv_dx):
    """Base cells of the compact (original-order) particles, gathered from
    the padded positions — int16 so the resort's layout-build fetch moves
    2 bytes/axis instead of 4 (n_grid < 32768 always holds)."""
    xc = jnp.take(x_padded, inv, axis=0)
    return tiling.base_cell_of(xc, inv_dx).astype(jnp.int16)


@jax.jit
def _base_cells_i16(x, inv_dx):
    return tiling.base_cell_of(x, inv_dx).astype(jnp.int16)


@jax.jit
def _count_out_of_window(x_padded, tile_coords, occupied, inv_dx):
    """Number of occupied slots whose base cell left its window's +/-1-cell
    drift band (these particles are clamped to the window edge in-kernel)."""
    base = tiling.base_cell_of(x_padded, inv_dx)
    origin = jnp.asarray(tiling.ORIGIN, jnp.int32)
    u0 = base - jnp.repeat(tile_coords, tiling.PBLK, axis=0) * origin + 1
    hi = jnp.asarray(tiling.U0_HI, jnp.int32)
    bad = jnp.any((u0 < 0) | (u0 > hi), axis=1) & (occupied > 0)
    return jnp.sum(bad.astype(jnp.int32))


def _tile_coords_per_slot(layout):
    return jnp.repeat(layout["tile_coords"], PBLK, axis=0)


def windows_to_combine_layout(windows, t):
    """(T3, 4*WIN_S, WIN_S^2) -> (t,t,t, WIN_S,WIN_S,WIN_S, 4) (linear-path
    helper, used by parity tests)."""
    assert NSLAB == 1, "linear helper requires square windows (no slab)"
    w = windows.reshape(t, t, t, transfer.N_GRID_CH, WIN_S, WIN_S, WIN_S)
    return jnp.moveaxis(w, 3, -1)


def grid_to_g2p_windows(grid_v, n_grid):
    """(G,G,G,3) -> (T3, 3*WIN_S, WIN_S^2) for the G2P kernel (linear path)."""
    assert NSLAB == 1, "linear helper requires square windows (no slab)"
    t = tiling.n_tiles(n_grid)
    wins = tiling.extract_windows(grid_v, n_grid)  # (t,t,t,16,16,16,3)
    w = jnp.moveaxis(wins, -1, 3)  # (t,t,t,3,16,16,16)
    return w.reshape(t * t * t, 3 * WIN_S, WIN_S * WIN_S)


def _box_or_cube(cfg: MPMConfig, box_dims, box_org):
    """Normalize the active-box spec to (org, dims).

    ``box_dims`` (tile extents) is SHAPE-STATIC; ``box_org`` (tile origin)
    may be a traced (3,) int32 array — the origin only offsets node
    coordinates / the domain mask, so a box migrating with the material
    re-uses the compiled program (tiling.build_padded_layout docstring)."""
    if box_dims is None:
        t = tiling.n_tiles(cfg.n_grid)
        return (0, 0, 0), (t, t, t)
    org = (0, 0, 0) if box_org is None else box_org
    return org, tuple(box_dims)


def _blocked_node_x(cfg: MPMConfig, box_dims=None, box_org=None):
    """(bx,by,bz,TILE,TILE,TILE,3) node coordinates of the active box;
    absolute world coordinates (org may be traced)."""
    org, dims = _box_or_cube(cfg, box_dims, box_org)
    axes = [
        (jnp.arange(dims[a] * TILE, dtype=jnp.float32)
         + jnp.asarray(org[a], jnp.float32) * TILE) * cfg.dx
        for a in range(3)
    ]
    node_x = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    return node_x.reshape(
        dims[0], TILE, dims[1], TILE, dims[2], TILE, 3
    ).transpose(0, 2, 4, 1, 3, 5, 6)


def _blocked_valid_mask(cfg: MPMConfig, box_dims=None, box_org=None):
    """1 for cells inside the n_grid domain, 0 for tile padding."""
    org, dims = _box_or_cube(cfg, box_dims, box_org)
    ax = [(jnp.asarray(org[a], jnp.int32) * TILE
           + jnp.arange(dims[a] * TILE)) < cfg.n_grid
          for a in range(3)]
    m = ax[0][:, None, None] & ax[1][None, :, None] & ax[2][None, None, :]
    return m.reshape(
        dims[0], TILE, dims[1], TILE, dims[2], TILE
    ).transpose(0, 2, 4, 1, 3, 5)


def _blocked_node_x_local(cfg: MPMConfig, nx: int, x_off):
    """x-slab variant of _blocked_node_x: local x-tile range
    [x_off, x_off+nx); x_off is a traced scalar (lax.axis_index * nx)."""
    t = tiling.n_tiles(cfg.n_grid)
    g_pad = t * TILE
    idx = jnp.arange(g_pad, dtype=jnp.float32) * cfg.dx
    xi = ((x_off * TILE).astype(jnp.float32)
          + jnp.arange(nx * TILE, dtype=jnp.float32)) * cfg.dx
    node_x = jnp.stack(jnp.meshgrid(xi, idx, idx, indexing="ij"), axis=-1)
    return node_x.reshape(nx, TILE, t, TILE, t, TILE, 3).transpose(
        0, 2, 4, 1, 3, 5, 6)


def _blocked_valid_mask_local(cfg: MPMConfig, nx: int, x_off):
    """x-slab variant of _blocked_valid_mask."""
    t = tiling.n_tiles(cfg.n_grid)
    g_pad = t * TILE
    xv = (x_off * TILE + jnp.arange(nx * TILE)) < cfg.n_grid
    idx = jnp.arange(g_pad) < cfg.n_grid
    m = xv[:, None, None] & idx[None, :, None] & idx[None, None, :]
    return m.reshape(nx, TILE, t, TILE, t, TILE).transpose(0, 2, 4, 1, 3, 5)


# ---------------------------------------------------------------------------
# SoA substep.  Per-particle state lives as packed component rows (soa.py:
# (3,N)/(9,N)/(6,N), N on the lane axis) through the whole frame scan; the
# AoS (N,3,3) layout puts the 3x3 dims on the register tile and ran every
# elementwise op at ~3/128 lane occupancy (profiled ~7.6 ms/substep of XLA
# glue at N=100k; see docs/DESIGN.md).
# ---------------------------------------------------------------------------

_SOA_MAT = ("F", "F_trial", "C", "stress")
_SOA_VEC = ("x", "v")
_SOA_SCALAR = ("mass", "vol", "material", "selection", "mu", "lam",
               "yield_stress", "bulk")


def state_to_soa(st: MPMState) -> dict:
    sd = {k: getattr(st, k) for k in _SOA_SCALAR}
    for k in _SOA_VEC:
        sd[k] = getattr(st, k).T
    for k in _SOA_MAT:
        sd[k] = soa.pack(soa.aos_mat_to_rows(getattr(st, k)))
    sd["cov"] = st.cov.T
    return sd


def soa_to_state(sd: dict, template: MPMState) -> MPMState:
    kw = {k: sd[k] for k in _SOA_SCALAR}
    for k in _SOA_VEC:
        kw[k] = sd[k].T
    for k in _SOA_MAT:
        kw[k] = soa.rows_to_aos_mat(soa.unpack(sd[k]))
    kw["cov"] = sd["cov"].T
    return template.replace(**kw)


def _apply_particle_bc_soa(b, time, dt, sd: dict) -> dict:
    """Row-list ports of the particle BCs (bc.py:150-226)."""
    v = soa.unpack(sd["v"])
    if isinstance(b, bc_mod.ParticleImpulse):
        active = (time >= b.start_time) & (time < b.end_time)
        sel = active & (b.mask > 0)
        v_new = [v[a] + b.force[a] / sd["mass"] * dt for a in range(3)]
        v = soa.where_rows(sel, v_new, v)
    elif isinstance(b, bc_mod.ParticleVelocityTranslation):
        active = (time >= b.start_time) & (time < b.end_time)
        sel = active & (b.mask > 0)
        v = [jnp.where(sel, b.velocity[a], v[a]) for a in range(3)]
    elif isinstance(b, bc_mod.ParticleVelocityRotation):
        x = soa.unpack(sd["x"])
        offset = [x[a] - b.point[a] for a in range(3)]
        along = sum(offset[a] * b.normal[a] for a in range(3))
        radial = [offset[a] - along * b.normal[a] for a in range(3)]
        horiz_dist = soa.norm3(radial)
        cosine = sum(offset[a] * b.horizontal_axis_1[a] for a in range(3)) \
            / jnp.maximum(horiz_dist, 1e-12)
        theta = jnp.arccos(jnp.clip(cosine, -1.0, 1.0))
        theta = jnp.where(
            sum(offset[a] * b.horizontal_axis_2[a] for a in range(3)) > 0,
            theta, -theta,
        )
        a1 = -horiz_dist * jnp.sin(theta) * b.rotation_scale
        a2 = horiz_dist * jnp.cos(theta) * b.rotation_scale
        v_new = [
            a1 * b.horizontal_axis_1[a] + a2 * b.horizontal_axis_2[a]
            + b.translation_scale * b.normal[a]
            for a in range(3)
        ]
        active = (time >= b.start_time) & (time < b.end_time)
        sel = active & (b.mask > 0)
        v = soa.where_rows(sel, v_new, v)
    return {**sd, "v": soa.pack(v)}


def grid_stage(windows, cfg: MPMConfig, bcs, time, dt, psum_axes=None,
               box_dims=None, box_org=None):
    """Combine per-tile P2G momentum windows into the blocked grid, run the
    grid update (normalize, gravity, BCs, domain mask), and re-extract
    per-tile G2P velocity windows.  The XLA stage between transfer kernels.

    ``box_dims``/``box_org``: optional (bx,by,bz) static tile extents and
    (traced) tile origin of the active box — windows, folds, and the blocked
    grid then cover only the occupied-tile bounding box
    (tiling.build_padded_layout docstring)."""
    t = tiling.n_tiles(cfg.n_grid)
    _, tdims = _box_or_cube(cfg, box_dims, box_org)
    t3 = tdims[0] * tdims[1] * tdims[2] * NSLAB  # sub-tile count
    if MM_FOLD or NSLAB > 1 or box_dims is not None:
        # matmul-fold path: combine/extract as constant-matrix MXU dots in
        # the kernel-native layout (tiling.combine_windows_mm docstring)
        grid_blocked = tiling.combine_windows_mm(
            windows, tdims, transfer.N_GRID_CH)
    else:
        # blocked-grid path: windows and grid stay tile-blocked, so combine
        # and extract are pure static slicing (no interleaving transposes)
        win_blocked = windows.reshape(
            t, t, t, transfer.N_GRID_CH, WIN_S, WIN_S, WIN_S
        )
        grid_blocked = tiling.combine_windows_blocked(
            win_blocked, transfer.N_GRID_CH)

    if psum_axes:
        grid_blocked = jax.lax.psum(grid_blocked, psum_axes)

    grid_cl = jnp.moveaxis(grid_blocked, 3, -1)  # channel-last (2MB, cheap)
    grid_v = grid_momentum_to_velocity(grid_cl, cfg, dt)
    if any(isinstance(b, bc_mod.GRID_BC_TYPES) for b in bcs):
        grid_v = apply_grid_bcs(
            grid_v, _blocked_node_x(cfg, box_dims, box_org), cfg, dt, time,
            bcs)
    grid_v = grid_v * _blocked_valid_mask(cfg, box_dims, box_org)[..., None]

    if MM_FOLD or NSLAB > 1 or box_dims is not None:
        return tiling.extract_windows_mm(jnp.moveaxis(grid_v, -1, 3))
    return tiling.extract_windows_blocked(
        jnp.moveaxis(grid_v, -1, 3)
    ).reshape(t3, transfer.N_VEL_CH * WIN_S, WIN_S * WIN_S)


def grid_stage_halo(windows, cfg: MPMConfig, bcs, time, dt, axis_name: str,
                    n_dev: int, nx: int, x_off):
    """x-slab-sharded grid stage: each device combines/updates/extracts only
    its nx x-tiles of the blocked grid; cross-device traffic is FOUR
    one-plane ppermutes per substep (two halo window-contribution planes in
    the combine, two grid planes in the extract) instead of the replicated
    path's full-grid psum.  SURVEY.md §5 'shard particles and grid across
    chips with halo exchange'."""
    t = tiling.n_tiles(cfg.n_grid)
    grid_blocked = tiling.combine_windows_mm_halo(
        windows, nx, t, transfer.N_GRID_CH, axis_name, n_dev)
    grid_cl = jnp.moveaxis(grid_blocked, 3, -1)
    grid_v = grid_momentum_to_velocity(grid_cl, cfg, dt)
    if any(isinstance(b, bc_mod.GRID_BC_TYPES) for b in bcs):
        grid_v = apply_grid_bcs(
            grid_v, _blocked_node_x_local(cfg, nx, x_off), cfg, dt, time, bcs)
    grid_v = grid_v * _blocked_valid_mask_local(cfg, nx, x_off)[..., None]
    return tiling.extract_windows_mm_halo(
        jnp.moveaxis(grid_v, -1, 3), t, transfer.N_VEL_CH, axis_name, n_dev)


def p2g2p_fast_soa(sd: dict, layout, cfg: MPMConfig, bcs, time, dt,
                   interpret: bool = False, psum_axes=None,
                   grid_fn=None) -> dict:
    """One substep on an SoA state dict (semantics of solver.p2g2p).

    ``psum_axes``: when run under shard_map with particles sharded, the
    local blocked P2G grid is all-reduced over these mesh axes before the
    grid update (the one collective per substep; solver_dist.py).

    ``grid_fn``: optional replacement for the combine/update/extract grid
    stage, ``windows -> g2p velocity windows`` (the x-slab halo-sharded
    path of solver_dist.py supplies one); ``layout['n_subtiles']`` then
    overrides the window-table size (a shard's LOCAL sub-tile count)."""
    t = tiling.n_tiles(cfg.n_grid)
    box_dims = layout.get("box_dims")  # static (bx,by,bz) tile extents
    box_org = layout.get("box_org")    # (3,) tile origin (may be traced)
    if box_dims is None and "box_tiles" in layout:
        # layouts straight from tiling.build_padded_layout carry the box as
        # separate keys; only treat a proper sub-box as boxed (a full-cube
        # layout must keep exercising the MM_FOLD=0 A/B path unchanged)
        org, dims = tuple(layout["box_origin"]), tuple(layout["box_tiles"])
        if org != (0, 0, 0) or dims != (t, t, t):
            box_dims, box_org = dims, org
    t3 = layout.get("n_subtiles", t * t * t * NSLAB)
    tile_rows = [
        jnp.repeat(layout["tile_coords"][:, a], PBLK) for a in range(3)
    ]

    # particle BCs before P2G (impulses, velocity modifiers)
    for b in bcs:
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            sd = _apply_particle_bc_soa(b, time, dt, sd)

    F_rows, stress_rows, ys, mu, lam = compute_stress_rows(
        soa.unpack(sd["F_trial"]), soa.unpack(sd["F"]),
        soa.unpack(sd["stress"]), sd["material"], sd["mu"], sd["lam"],
        sd["yield_stress"], sd["bulk"], sd["selection"], cfg, dt,
    )

    # RPIC/PIC damping of C (p2g_apic_with_stress, mpm_utils.py:372-379)
    C = soa.unpack(sd["C"])
    if cfg.rpic_damping < -0.001:
        C = [jnp.zeros_like(c) for c in C]
    elif cfg.rpic_damping != 0.0:
        Ct = soa.transpose(C)
        C = [(1.0 - cfg.rpic_damping) * c + cfg.rpic_damping / 2.0 * (c - ct)
             for c, ct in zip(C, Ct)]

    active_f = (sd["selection"] == 0).astype(jnp.float32)
    x_rows = soa.unpack(sd["x"])
    v_rows = soa.unpack(sd["v"])
    pdata = transfer.build_pdata_rows(
        x_rows, v_rows, C, stress_rows, sd["mass"] * active_f,
        sd["vol"] * active_f, tile_rows, dt, cfg.dx, cfg.inv_dx,
    )

    windows = transfer.p2g_tiled_t(pdata, layout["block_tile"], t3,
                                   interpret=interpret)
    if grid_fn is not None:
        g2p_wins = grid_fn(windows, time)
    else:
        if psum_axes:
            # Under shard_map a shard's local blocks need not cover every
            # tile, and p2g_tiled_t leaves windows of uncovered tiles
            # uninitialized (only the first program of a tile zeroes its
            # block).  Select them to zero before they enter the psum.
            # block_tile is loop-invariant so XLA hoists this tiny scatter
            # out of the substep scan.
            covered = jnp.zeros((t3,), jnp.float32).at[
                layout["block_tile"]].set(1.0)
            windows = jnp.where(covered[:, None, None] > 0, windows, 0.0)
        g2p_wins = grid_stage(windows, cfg, bcs, time, dt,
                              psum_axes=psum_axes, box_dims=box_dims,
                              box_org=box_org)
    out = transfer.g2p_tiled_t(pdata, g2p_wins, layout["block_tile"],
                               interpret=interpret)

    new_v = [out[c * 7] for c in range(3)]
    sC = cfg.inv_dx * 4.0
    new_C = [out[c * 7 + 1 + a] * sC for c in range(3) for a in range(3)]
    grad_v = [out[c * 7 + 4 + a] * cfg.inv_dx for c in range(3) for a in range(3)]

    x_new = [x_rows[a] + dt * new_v[a] for a in range(3)]
    eye = soa.identity_rows(grad_v[0])
    a_rows = [e + g * dt for e, g in zip(eye, grad_v)]
    F_trial_new = soa.mm(a_rows, F_rows)

    is_active = sd["selection"] == 0
    out_sd = dict(sd)
    out_sd["F"] = soa.pack(F_rows)
    out_sd["stress"] = soa.pack(stress_rows)
    out_sd["yield_stress"] = ys
    out_sd["mu"] = mu
    out_sd["lam"] = lam
    out_sd["v"] = soa.pack(soa.where_rows(is_active, new_v, v_rows))
    out_sd["x"] = soa.pack(soa.where_rows(is_active, x_new, x_rows))
    out_sd["C"] = soa.pack(soa.where_rows(is_active, new_C, soa.unpack(sd["C"])))
    out_sd["F_trial"] = soa.pack(
        soa.where_rows(is_active, F_trial_new, soa.unpack(sd["F_trial"])))
    if cfg.update_cov_with_F:
        c6 = soa.unpack(sd["cov"])  # [00, 01, 02, 11, 12, 22]
        cm = [c6[0], c6[1], c6[2], c6[1], c6[3], c6[4], c6[2], c6[4], c6[5]]
        gc = soa.mm(grad_v, cm)
        gct = soa.transpose(gc)
        cov_new = [c + dt * (g + gt) for c, g, gt in zip(cm, gc, gct)]
        cov_rows = [cov_new[0], cov_new[1], cov_new[2],
                    cov_new[4], cov_new[5], cov_new[8]]
        out_sd["cov"] = soa.pack(
            soa.where_rows(is_active, cov_rows, c6))
    return out_sd


def _p2g_windows(sd: dict, layout, cfg: MPMConfig, dt, t3,
                 interpret: bool):
    """Stress-applied P2G splat of an SoA state (the fused frame's prologue;
    returns (sd_with_stress_applied, windows))."""
    tile_rows = [
        jnp.repeat(layout["tile_coords"][:, a], PBLK) for a in range(3)
    ]
    F_rows, stress_rows, ys, mu, lam = compute_stress_rows(
        soa.unpack(sd["F_trial"]), soa.unpack(sd["F"]),
        soa.unpack(sd["stress"]), sd["material"], sd["mu"], sd["lam"],
        sd["yield_stress"], sd["bulk"], sd["selection"], cfg, dt,
    )
    C = soa.unpack(sd["C"])
    if cfg.rpic_damping < -0.001:
        C = [jnp.zeros_like(c) for c in C]
    elif cfg.rpic_damping != 0.0:
        Ct = soa.transpose(C)
        C = [(1.0 - cfg.rpic_damping) * c + cfg.rpic_damping / 2.0 * (c - ct)
             for c, ct in zip(C, Ct)]
    active_f = (sd["selection"] == 0).astype(jnp.float32)
    pdata = transfer.build_pdata_rows(
        soa.unpack(sd["x"]), soa.unpack(sd["v"]), C, stress_rows,
        sd["mass"] * active_f, sd["vol"] * active_f, tile_rows, dt,
        cfg.dx, cfg.inv_dx,
    )
    windows = transfer.p2g_tiled_t(pdata, layout["block_tile"], t3,
                                   interpret=interpret)
    sd = dict(sd)
    sd["F"] = soa.pack(F_rows)
    sd["stress"] = soa.pack(stress_rows)
    sd["yield_stress"] = ys
    sd["mu"] = mu
    sd["lam"] = lam
    return sd, windows


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_substeps", "n_blocks", "dt", "interpret",
                     "box_dims"),
)
def simulate_substeps_fused(state_padded: MPMState, block_tile, tile_coords,
                            occupied, cfg: MPMConfig, bcs, time0, dt: float,
                            n_substeps: int, n_blocks: int,
                            interpret: bool = False, box_dims=None,
                            box_org=None) -> MPMState:
    """A frame of substeps with ONE fused Pallas launch per substep
    (ops/fused_substep.py: G2P + advect + constitutive + P2G in-kernel;
    grid stage as XLA between launches).  Semantics of
    simulate_substeps_fast for configs WITHOUT particle BCs (caller
    dispatches; tests/test_fast_solver.py asserts parity)."""
    from pixie_tpu.ops import fused_substep as fs

    assert not any(isinstance(b, bc_mod.PARTICLE_BC_TYPES) for b in bcs), \
        "fused path does not support particle BCs (use the two-kernel path)"
    t = tiling.n_tiles(cfg.n_grid)
    if box_dims is not None:
        t3 = box_dims[0] * box_dims[1] * box_dims[2] * NSLAB
    else:
        t3 = t * t * t * NSLAB  # sub-tile (window-table) count
    layout = {
        "block_tile": block_tile,
        "tile_coords": tile_coords,
        "occupied": occupied,
    }

    sd = state_to_soa(state_padded)
    # prologue: stress(0) + P2G(0)
    sd, windows = _p2g_windows(sd, layout, cfg, dt, t3, interpret)
    dyn = fs.pack_dyn(sd)
    stat = fs.pack_static(sd)
    bt = jnp.asarray(block_tile)
    tc = jnp.asarray(tile_coords)

    def body(carry, step):
        dyn, windows = carry
        t_now = time0 + step.astype(jnp.float32) * dt
        wins_v = grid_stage(windows, cfg, bcs, t_now, dt,
                            box_dims=box_dims, box_org=box_org)
        dyn, windows = fs.fused_substep(
            dyn, stat, wins_v, bt, tc, cfg, dt, t3, interpret=interpret)
        return (dyn, windows), None

    if n_substeps > 1:
        (dyn, windows), _ = jax.lax.scan(
            body, (dyn, windows), jnp.arange(n_substeps - 1))

    # epilogue: grid(S-1) + G2P(S-1) + advect
    t_last = time0 + jnp.float32(n_substeps - 1) * dt
    wins_v = grid_stage(windows, cfg, bcs, t_last, dt,
                        box_dims=box_dims, box_org=box_org)
    sd = fs.unpack_dyn(dyn, sd)
    tile_rows = [jnp.repeat(tc[:, a], PBLK) for a in range(3)]
    x_rows = soa.unpack(sd["x"])
    v_rows = soa.unpack(sd["v"])
    active_f = (sd["selection"] == 0).astype(jnp.float32)
    pdata = transfer.build_pdata_rows(
        x_rows, v_rows, soa.unpack(sd["C"]), soa.unpack(sd["stress"]),
        sd["mass"] * active_f, sd["vol"] * active_f, tile_rows, dt,
        cfg.dx, cfg.inv_dx,
    )
    out = transfer.g2p_tiled_t(pdata, wins_v, bt, interpret=interpret)

    new_v = [out[c * 7] for c in range(3)]
    sC = cfg.inv_dx * 4.0
    new_C = [out[c * 7 + 1 + a] * sC for c in range(3) for a in range(3)]
    grad_v = [out[c * 7 + 4 + a] * cfg.inv_dx
              for c in range(3) for a in range(3)]
    F_rows = soa.unpack(sd["F"])
    x_new = [x_rows[a] + dt * new_v[a] for a in range(3)]
    eye = soa.identity_rows(grad_v[0])
    a_rows = [e + g * dt for e, g in zip(eye, grad_v)]
    F_trial_new = soa.mm(a_rows, F_rows)

    is_active = sd["selection"] == 0
    sd["v"] = soa.pack(soa.where_rows(is_active, new_v, v_rows))
    sd["x"] = soa.pack(soa.where_rows(is_active, x_new, x_rows))
    sd["C"] = soa.pack(soa.where_rows(is_active, new_C, soa.unpack(sd["C"])))
    sd["F_trial"] = soa.pack(
        soa.where_rows(is_active, F_trial_new, soa.unpack(sd["F_trial"])))
    if cfg.update_cov_with_F:
        c6 = soa.unpack(sd["cov"])
        cm = [c6[0], c6[1], c6[2], c6[1], c6[3], c6[4], c6[2], c6[4], c6[5]]
        gc = soa.mm(grad_v, cm)
        gct = soa.transpose(gc)
        cov_new = [c + dt * (g + gt) for c, g, gt in zip(cm, gc, gct)]
        sd["cov"] = soa.pack(soa.where_rows(
            is_active,
            [cov_new[0], cov_new[1], cov_new[2], cov_new[4], cov_new[5],
             cov_new[8]], c6))
    return soa_to_state(sd, state_padded)


def p2g2p_fast(state: MPMState, layout, cfg: MPMConfig, bcs, time, dt,
               interpret: bool = False) -> MPMState:
    """One substep on padded tile-sorted AoS state (wrapper over the SoA
    path; semantics of solver.p2g2p)."""
    sd = state_to_soa(state)
    sd = p2g2p_fast_soa(sd, layout, cfg, bcs, time, dt, interpret=interpret)
    return soa_to_state(sd, state)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_substeps", "n_blocks", "interpret",
                     "box_dims"),
)
def simulate_substeps_fast(state_padded: MPMState, block_tile, tile_coords,
                           occupied, cfg: MPMConfig, bcs, time0, dt,
                           n_substeps: int, n_blocks: int,
                           interpret: bool = False, box_dims=None,
                           box_org=None) -> MPMState:
    """A frame of substeps on padded state — one compiled scan."""
    layout = {
        "block_tile": block_tile,
        "tile_coords": tile_coords,
        "occupied": occupied,
    }
    if box_dims is not None:
        layout["box_dims"] = box_dims
        layout["box_org"] = box_org
        layout["n_subtiles"] = (box_dims[0] * box_dims[1] * box_dims[2]
                                * NSLAB)

    def body(sd, step):
        t_now = time0 + step.astype(jnp.float32) * dt
        sd = p2g2p_fast_soa(sd, layout, cfg, bcs, t_now, dt,
                            interpret=interpret)
        return sd, None

    # the scan carries the SoA layout (lane-efficient); AoS<->SoA transposes
    # run once per frame, amortized over n_substeps
    sd, _ = jax.lax.scan(body, state_to_soa(state_padded),
                         jnp.arange(n_substeps))
    return soa_to_state(sd, state_padded)


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
        # active-box layout: windows/folds/grid restricted to the occupied-
        # tile bounding box (+1-tile halo ring).  At sparse big-grid scenes
        # (n_grid=120 real scene: 9.4% tiles occupied) this removes most
        # empty-sub-tile kernel blocks and shrinks every fold/grid op.
        self.use_box = os.environ.get("PIXIE_BOX", "1") == "1"
        # running elementwise max of box dims / block count: both are
        # shape-static in the jitted frame, so never shrinking them means a
        # settling/compressing object keeps reusing the compiled program
        # (origin is traced)
        self._box_dims_max = None
        self._n_blocks_max = 0
        # per-phase resort cost accumulators (seconds) — read by the
        # realscene bench to attribute the resort-event frame overhead
        # (x fetch + layout build are host/tunnel-bound; pad is device)
        self.resort_stats = {"n": 0, "unpad_s": 0.0, "x_fetch_s": 0.0,
                             "build_s": 0.0, "pad_s": 0.0, "bc_pad_s": 0.0}

    def _resort(self):
        rs = self.resort_stats
        rs["n"] += 1
        composed = (
            self._padded is not None and self._compact_dirty
            and os.environ.get("PIXIE_COMPOSED_RESORT", "1") == "1"
        )
        if composed:
            # COMPOSED resort (r4 verdict weak #1: the 2.3 s unpad->host->pad
            # chain): never materialize the compact state.  The new layout's
            # perm maps new slots -> original particle ids; composing with
            # the old inverse maps new slots -> OLD PADDED slots, so the
            # whole re-layout is ONE device gather of the padded state
            # instead of two, and the host build consumes device-computed
            # int16 base cells (1/3 the tunnel bytes of the f32 positions).
            t0 = time.perf_counter()
            inv_old = inverse_perm(self._layout, self.n_particles)
            base = np.asarray(_compact_base_cells(
                self._padded.x, jnp.asarray(inv_old),
                jnp.float32(self.cfg.inv_dx)))
            rs["x_fetch_s"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            self._layout = tiling.build_padded_layout(
                None, self.cfg.n_grid, self.cfg.inv_dx, box=self.use_box,
                box_dims_min=self._box_dims_max,
                n_blocks_min=self._n_blocks_max, base=base,
            )
            rs["build_s"] += time.perf_counter() - t0
            old_padded = self._padded
        else:
            if self._padded is not None and self._compact_dirty:
                t0 = time.perf_counter()
                self._compact_state = unpad_state(
                    self._padded, self._layout, self.n_particles)
                rs["unpad_s"] += time.perf_counter() - t0
                self._compact_dirty = False
            t0 = time.perf_counter()
            base = np.asarray(_base_cells_i16(
                self._compact_state.x, jnp.float32(self.cfg.inv_dx)))
            rs["x_fetch_s"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            self._layout = tiling.build_padded_layout(
                None, self.cfg.n_grid, self.cfg.inv_dx, box=self.use_box,
                box_dims_min=self._box_dims_max,
                n_blocks_min=self._n_blocks_max, base=base,
            )
            rs["build_s"] += time.perf_counter() - t0
        if self.use_box:
            self._box_dims_max = self._layout["box_tiles"]
        self._n_blocks_max = max(self._n_blocks_max,
                                 int(self._layout["n_blocks"]))
        t0 = time.perf_counter()
        if composed:
            comp = inv_old[self._layout["perm_np"]]
            self._padded = pad_state_to_layout(
                old_padded,
                {"perm": jnp.asarray(comp),
                 "occupied": self._layout["occupied"]},
            )
            # compact state stays stale; unpad happens lazily via .state
        else:
            self._padded = pad_state_to_layout(
                self._compact_state, self._layout)
        rs["pad_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        self._bcs_padded = self._pad_particle_bcs()
        rs["bc_pad_s"] += time.perf_counter() - t0

    def _pad_particle_bcs(self):
        """Particle-BC masks are per-particle in ORIGINAL order; the SoA
        rows the substep sees are padded tile-sorted slots.  Gather each
        mask through the layout permutation (padding slots get 0) — must
        re-run on every resort."""
        perm = self._layout["perm"]
        occ = self._layout["occupied"]

        def pad_bc(b):
            if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
                m = jnp.take(jnp.asarray(b.mask), perm) * occ
                return b.replace(mask=m)
            return b

        return tuple(pad_bc(b) for b in self.bcs)

    def _needs_resort(self) -> bool:
        """True when more than ``resort_tol`` of the occupied particles
        drifted beyond the +/-1 cell the node windows absorb (u0 outside the
        per-axis [0, U0_HI]).

        tol = 0 (default) resorts on ANY drifted particle — the exact
        policy.  ``PIXIE_RESORT_TOL`` (fraction of n_particles, e.g. 2e-4)
        tolerates that many clamped particles per frame before paying a
        resort; clamping is the SAME approximation the solver already
        applies to particles that drift out mid-frame (the 400-substep
        frame scan never resorts), so a small tolerance extends an existing
        error budget rather than introducing a new one.  Skips and the
        worst clamped count are recorded in resort_stats."""
        if self._padded is None:
            return True
        lay = self._layout
        n_bad = int(_count_out_of_window(
            self._padded.x, lay["tile_coords"], lay["occupied"],
            jnp.float32(self.cfg.inv_dx)))
        tol = float(os.environ.get("PIXIE_RESORT_TOL", "0"))
        if n_bad > tol * self.n_particles:
            return True
        if n_bad:
            rs = self.resort_stats
            rs["skipped"] = rs.get("skipped", 0) + 1
            rs["max_clamped"] = max(rs.get("max_clamped", 0), n_bad)
        return False

    def step_frame(self, n_substeps: int, dt: float):
        if self._needs_resort():
            self._resort()
        lay = self._layout
        # fused path per FRAME: particle BCs are usually time-bounded (the
        # tree config's impulse covers a few substeps at t=0), so frames
        # whose [t0, t1) window no particle BC intersects run the fused
        # kernel; only BC-active frames fall back to the two-kernel path.
        t0, t1 = self.time, self.time + n_substeps * dt
        bc_active = any(
            isinstance(b, bc_mod.PARTICLE_BC_TYPES)
            and b.start_time < t1 and b.end_time > t0
            for b in self.bcs
        )
        # default OFF: the r4 TPU A/B measured fused as equal-or-worse at
        # every scale (100k: 112.8 vs 121.6 substeps/s; realscene 500k/120:
        # 19.9 vs 20.6) with 2-3x longer compiles — consistent with the
        # per-block floor model (docs/DESIGN.md): same block count, same
        # pass count, no win from fusing.  Flag kept for A/B forensics.
        use_fused = (
            os.environ.get("PIXIE_FUSED", "0") == "1" and not bc_active
        )
        if self.use_box:
            box_dims = tuple(lay["box_tiles"])
            box_org = jnp.asarray(lay["box_origin"], jnp.int32)
        else:
            box_dims, box_org = None, None
        if use_fused:
            # inactive particle BCs are no-ops this frame; drop them so the
            # fused driver's no-particle-BC precondition holds
            bcs_frame = tuple(
                b for b in self._bcs_padded
                if not isinstance(b, bc_mod.PARTICLE_BC_TYPES)
            )
            self._padded = simulate_substeps_fused(
                self._padded, lay["block_tile"], lay["tile_coords"],
                lay["occupied"], self.cfg, bcs_frame, jnp.float32(self.time),
                float(dt), n_substeps, lay["n_blocks"],
                interpret=self.interpret, box_dims=box_dims, box_org=box_org,
            )
        else:
            self._padded = simulate_substeps_fast(
                self._padded, lay["block_tile"], lay["tile_coords"],
                lay["occupied"], self.cfg, self._bcs_padded, jnp.float32(self.time),
                jnp.float32(dt), n_substeps, lay["n_blocks"],
                interpret=self.interpret, box_dims=box_dims, box_org=box_org,
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
