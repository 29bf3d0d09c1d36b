"""Multi-chip MPM: particle-sharded substeps under shard_map.

The reference has no distributed physics (single-GPU Warp kernels,
mpm_solver_warp.py); this is the TPU-native scale axis SURVEY.md section 5
calls for.  Decomposition:

  * particles are sharded along N over every mesh axis (pure data
    decomposition — P2G/stress/G2P are embarrassingly parallel per particle),
  * each shard scatters its particles into a LOCAL dense grid, which is
    summed across chips with one ``psum`` per substep (the only collective),
  * grid normalization/gravity/BCs run replicated (cheap: G^3 x 4), and G2P
    gathers from the replicated grid locally.

Communication volume: one (G,G,G,4) fp32 allreduce per substep — 2 MB at
G=50, riding ICI.  This beats halo exchange until particles are spatially
pre-partitioned; a blocked-grid halo variant only pays off once G^3 psum
costs exceed the (boundary-surface) exchange, i.e. very large grids.

Numerics: per-shard segment-sums followed by psum reorder fp32 additions
relative to the single-device path; rollouts agree to ~1e-6 per substep
(asserted in tests/test_solver_dist.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixie_tpu.ops import tiling
from pixie_tpu.sim import bc as bc_mod
from pixie_tpu.sim import solver_fast
from pixie_tpu.sim.solver import compute_stress_from_F_trial, g2p, grid_update, p2g
from pixie_tpu.sim.types import MPMConfig, MPMState


def _particle_spec(mesh: Mesh) -> P:
    """Shard the particle axis over ALL mesh axes."""
    return P(tuple(mesh.axis_names))


def shard_particles(mesh: Mesh, state: MPMState, bcs=None):
    """Pad N to a multiple of the mesh size (padding marked selection=1, i.e.
    excluded from simulation exactly like the reference's particle_selection,
    mpm_solver_warp.py kernels) and place every per-particle array sharded.

    With ``bcs``, particle-BC masks — per-particle arrays living OUTSIDE the
    state pytree — are zero-padded and sharded the same way, and
    ``(state, bcs)`` is returned; a full-length replicated mask inside a
    shard_map body would broadcast against N/n_dev-row shards."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = state.n_particles
    pad = (-n) % n_dev
    if pad:
        def pad_arr(a):
            if a.ndim >= 1 and a.shape[0] == n:
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, widths)
            return a

        state = jax.tree.map(pad_arr, state)
        state = state.replace(
            selection=state.selection.at[n:].set(1),
            # keep padded particles inside the grid so splat indices are valid
            x=state.x.at[n:].set(jnp.asarray(1.0, state.x.dtype)),
        )
    spec = _particle_spec(mesh)
    n_tot = state.x.shape[0]
    sharding = NamedSharding(mesh, spec)

    def put(a):
        if a.ndim >= 1 and a.shape[0] == n_tot:
            return jax.device_put(a, sharding)
        return jax.device_put(a, NamedSharding(mesh, P()))

    state = jax.tree.map(put, state)
    if bcs is None:
        return state

    def pad_put_bc(b):
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            m = jnp.asarray(b.mask)
            if m.shape[0] != n_tot:
                m = jnp.pad(m, (0, n_tot - m.shape[0]))
            return b.replace(mask=jax.device_put(m, sharding))
        return b

    return state, tuple(pad_put_bc(b) for b in bcs)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "n_substeps")
)
def simulate_substeps_sharded(
    state: MPMState, cfg: MPMConfig, bcs, time0, dt, n_substeps: int,
    mesh: Mesh,
) -> MPMState:
    """Run n_substeps with particles sharded over the mesh (one psum of the
    (G,G,G,4) momentum/mass grid per substep)."""
    axes = tuple(mesh.axis_names)
    spec = _particle_spec(mesh)
    state_specs = jax.tree.map(lambda _: spec, state)
    n_tot = state.x.shape[0]
    # particle-BC masks ride sharded like the state rows (shard_particles
    # pads + places them); every other BC leaf is replicated
    bc_specs = jax.tree.map(
        lambda a: spec if (getattr(a, "ndim", 0) >= 1
                           and a.shape[0] == n_tot) else P(),
        bcs,
    )

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(state_specs, bc_specs),
        out_specs=state_specs, check_vma=False,
    )
    def run(st: MPMState, bcs_l) -> MPMState:
        def body(carry, step):
            st = carry
            t = time0 + step.astype(jnp.float32) * dt
            for b in bcs_l:
                if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
                    st = b.apply(t, dt, st)
            st = compute_stress_from_F_trial(st, cfg, dt)
            grid = p2g(st, cfg, dt)               # local shard's scatter
            grid = jax.lax.psum(grid, axes)       # the one collective
            grid_v = grid_update(grid, cfg, dt, t, bcs_l)  # replicated compute
            st = g2p(st, grid_v, cfg, dt)
            return st, None

        st, _ = jax.lax.scan(body, st, jnp.arange(n_substeps))
        return st

    return run(state, bcs)


# ---------------------------------------------------------------------------
# Fast-path (Pallas kernel) variant: the production tile-sorted substep of
# solver_fast.py under shard_map.  Particle BLOCKS (PBLK-slot groups of the
# padded tile-sorted layout) are split contiguously across the mesh; each
# shard runs the Pallas P2G/G2P kernels on its local blocks and the blocked
# momentum grid is psum'd once per substep (solver_fast.p2g2p_fast_soa
# masks windows of tiles its shard does not cover).
# ---------------------------------------------------------------------------


def pad_layout_for_mesh(layout: dict, n_dev: int) -> dict:
    """Extend a tiling.build_padded_layout dict so n_blocks % n_dev == 0.

    Filler blocks are all-padding (occupied=0 -> zero mass/vol, zero
    contribution) and point at the last tile, exactly like the builder's own
    bucket filler (ops/tiling.py build_padded_layout)."""
    nb = int(layout["n_blocks"])
    pad = (-nb) % n_dev
    if pad == 0:
        return layout
    t3m1 = int(np.asarray(layout["block_tile"]).max())  # last tile id
    out = dict(layout)
    out["block_tile"] = jnp.concatenate(
        [jnp.asarray(layout["block_tile"]),
         jnp.full((pad,), t3m1, jnp.int32)])
    out["tile_coords"] = jnp.concatenate(
        [jnp.asarray(layout["tile_coords"]),
         jnp.tile(jnp.asarray(layout["tile_coords"])[-1:], (pad, 1))])
    out["perm"] = jnp.concatenate(
        [jnp.asarray(layout["perm"]),
         jnp.zeros((pad * tiling.PBLK,), jnp.int32)])
    out["occupied"] = jnp.concatenate(
        [jnp.asarray(layout["occupied"]),
         jnp.zeros((pad * tiling.PBLK,), jnp.float32)])
    # keep the host copies (consumed by unpad/inverse_perm) in sync
    if "perm_np" in layout:
        out["perm_np"] = np.concatenate(
            [np.asarray(layout["perm_np"]),
             np.zeros(pad * tiling.PBLK, np.int32)])
    if "occupied_np" in layout:
        out["occupied_np"] = np.concatenate(
            [np.asarray(layout["occupied_np"]),
             np.zeros(pad * tiling.PBLK, np.float32)])
    out["n_blocks"] = nb + pad
    return out


def pad_particle_bcs_for_layout(bcs, layout) -> tuple:
    """Gather particle-BC masks through a padded layout's permutation so the
    mask rows align with the tile-sorted SoA slots (padding/filler slots get
    0) — the sharded-path analog of FastMPMSolver._pad_particle_bcs.  After
    this, a mask leaf has n_blocks*PBLK rows and shards over the mesh
    exactly like the state rows, so every BC type runs on every sharded
    path (reference applies all BCs regardless of scale,
    mpm_solver_warp.py:514-637)."""
    perm = jnp.asarray(layout["perm"])
    occ = jnp.asarray(layout["occupied"])

    def pad_bc(b):
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            m = jnp.take(jnp.asarray(b.mask), perm) * occ
            return b.replace(mask=m)
        return b

    return tuple(pad_bc(b) for b in bcs)


def _bc_specs(bcs, n_rows: int, part: P):
    """Partition specs for a BC pytree: padded per-particle mask leaves
    (first axis == n_rows) ride sharded; every other leaf is replicated."""
    return jax.tree.map(
        lambda a: part if (getattr(a, "ndim", 0) >= 1
                           and a.shape[0] == n_rows) else P(),
        bcs,
    )


def _shard_padded_bcs(bcs, part: NamedSharding | P):
    """device_put layout-padded particle-BC masks with the particle
    sharding (rollout wrappers; `part` may be a spec — then resolved by the
    jit's in_shardings instead)."""
    if not isinstance(part, NamedSharding):
        return bcs

    def put_bc(b):
        if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
            return b.replace(mask=jax.device_put(b.mask, part))
        return b

    return tuple(put_bc(b) for b in bcs)


def _soa_spec(sd: dict, axes: tuple) -> dict:
    """Partition specs for an SoA state dict: N rides the LAST axis of every
    entry ((N,) scalars, (3,N)/(6,N)/(9,N) rows), sharded over ``axes``."""
    return {
        k: P(*([None] * (v.ndim - 1) + [axes]))
        for k, v in sd.items()
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "n_substeps", "interpret"),
)
def simulate_substeps_fast_sharded(
    state_padded: MPMState, block_tile, tile_coords, occupied,
    cfg: MPMConfig, bcs, time0, dt, n_substeps: int, mesh: Mesh,
    interpret: bool = False,
) -> MPMState:
    """A frame of Pallas fast-path substeps with particle blocks sharded
    over the mesh (the solver_fast.simulate_substeps_fast analog; one
    (t,t,t,4,TILE^3) fp32 psum per substep).

    ``state_padded``/layout args must come from tiling.build_padded_layout
    + pad_state_to_layout, with n_blocks a multiple of the mesh size
    (pad_layout_for_mesh)."""
    axes = tuple(mesh.axis_names)
    part = P(axes)

    sd0 = solver_fast.state_to_soa(state_padded)
    sd_specs = _soa_spec(sd0, axes)
    # particle-BC masks must be in padded layout order
    # (pad_particle_bcs_for_layout); they then shard like the state rows
    bc_specs = _bc_specs(bcs, state_padded.x.shape[0], part)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(sd_specs, part, P(axes, None), bc_specs),
        out_specs=sd_specs,
        check_vma=False,
    )
    def run(sd: dict, bt, tc, bcs_l) -> dict:
        layout = {"block_tile": bt, "tile_coords": tc}

        def body(sd, step):
            t_now = time0 + step.astype(jnp.float32) * dt
            sd = solver_fast.p2g2p_fast_soa(
                sd, layout, cfg, bcs_l, t_now, dt,
                interpret=interpret, psum_axes=axes,
            )
            return sd, None

        sd, _ = jax.lax.scan(body, sd, jnp.arange(n_substeps))
        return sd

    sd = run(sd0, jnp.asarray(block_tile), jnp.asarray(tile_coords), bcs)
    return solver_fast.soa_to_state(sd, state_padded)


def rollout_fast_sharded(state: MPMState, cfg: MPMConfig, mesh: Mesh,
                         bcs=(), n_substeps: int = 8, dt: float = 1e-4,
                         time0: float = 0.0,
                         interpret: bool | None = None) -> MPMState:
    """Convenience wrapper: build the tile-sorted layout, pad blocks to the
    mesh, shard, run one frame of substeps, and unpad back to the original
    particle order."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    layout = tiling.build_padded_layout(
        np.asarray(state.x), cfg.n_grid, cfg.inv_dx)
    layout = pad_layout_for_mesh(layout, n_dev)
    padded = solver_fast.pad_state_to_layout(state, layout)

    part = NamedSharding(mesh, _particle_spec(mesh))

    def put(a):
        if a.ndim >= 1 and a.shape[0] == padded.x.shape[0]:
            return jax.device_put(a, part)
        return jax.device_put(a, NamedSharding(mesh, P()))

    padded = jax.tree.map(put, padded)
    bcs = _shard_padded_bcs(
        pad_particle_bcs_for_layout(tuple(bcs), layout), part)
    out = simulate_substeps_fast_sharded(
        padded, layout["block_tile"], layout["tile_coords"],
        layout["occupied"], cfg, bcs, jnp.float32(time0),
        jnp.float32(dt), n_substeps, mesh, interpret=interpret,
    )
    return solver_fast.unpad_state(out, layout, state.n_particles)


# ---------------------------------------------------------------------------
# x-slab halo-sharded fast path: particles AND grid sharded by x-tile slabs.
#
# The psum variants above replicate the grid — every substep allreduces the
# full (t,t,t,4,TILE^3) momentum grid (G=120: 27.6 MB, ring allreduce moves
# ~2x that per chip).  Here device d owns x-tiles [d*nx, (d+1)*nx): its
# particles (tile-sorted blocks are x-major, so the slab split is a
# contiguous block range), its slice of the blocked grid, and the grid
# update for that slice.  Cross-device traffic per substep is FOUR
# one-plane ppermutes (ops/tiling.py combine/extract *_halo): 2 halo
# window-contribution planes + 2 grid planes = 4 x (t,t,4,TILE^3) fp32 —
# G=120: 11 MB total vs ~55 MB allreduced, independent of device count,
# and the grid update compute shards n_dev-ways instead of replicating.
# SURVEY.md §5: "shard particles and grid across chips with halo exchange
# over ICI for >1M-particle scenes".
# ---------------------------------------------------------------------------


def build_halo_layout(x: np.ndarray, n_grid: int, inv_dx: float,
                      n_dev: int) -> dict:
    """Host-side x-slab layout: per-device tile-sorted padded blocks with a
    COMMON per-device block count (so the concatenated arrays shard evenly).

    block_tile holds LOCAL sub-tile ids (window tables are per-device);
    tile_coords holds GLOBAL sub-tile coordinates (kernel window origins).
    Requires n_tiles(n_grid) % n_dev == 0."""
    t = tiling.n_tiles(n_grid)
    assert t % n_dev == 0, (
        f"halo sharding needs n_tiles={t} divisible by n_dev={n_dev}")
    nx = t // n_dev
    x = np.asarray(x)
    base = np.floor(x * inv_dx - 0.5).astype(np.int32)
    tc = np.clip(base // tiling.TILE, 0, t - 1)
    slab = np.clip((base[:, 2] - tc[:, 2] * tiling.TILE) // tiling.SLAB,
                   0, tiling.NSLAB - 1)
    dev = tc[:, 0] // nx
    loc_tid = ((((tc[:, 0] - dev * nx) * t + tc[:, 1]) * t + tc[:, 2])
               * tiling.NSLAB + slab)
    n_sub = nx * t * t * tiling.NSLAB

    per_dev = []
    for d in range(n_dev):
        sel = np.nonzero(dev == d)[0]
        order = sel[np.argsort(loc_tid[sel], kind="stable")]
        counts = np.bincount(loc_tid[order], minlength=n_sub)
        blocks_per = np.maximum(-(-counts // tiling.PBLK), 1)
        per_dev.append((order, counts, blocks_per))
    nb_local = max(int(b.sum()) for _, _, b in per_dev)
    nb_local = -(-nb_local // 8) * 8  # mild bucketing for compile reuse

    perm, occ, btile, tcoords = [], [], [], []
    for d, (order, counts, blocks_per) in enumerate(per_dev):
        bp = blocks_per.copy()
        bp[n_sub - 1] += nb_local - int(bp.sum())
        p = np.zeros(nb_local * tiling.PBLK, np.int32)
        o = np.zeros(nb_local * tiling.PBLK, np.float32)
        bt = np.zeros(nb_local, np.int32)
        starts = np.cumsum(counts) - counts
        blk = 0
        for u in range(n_sub):
            c, src = counts[u], starts[u]
            for b in range(int(bp[u])):
                take = int(min(tiling.PBLK, max(c - b * tiling.PBLK, 0)))
                s0 = blk * tiling.PBLK
                if take:
                    lo = src + b * tiling.PBLK
                    p[s0:s0 + take] = order[lo:lo + take]
                    o[s0:s0 + take] = 1.0
                bt[blk] = u
                blk += 1
        tx_loc = bt // (t * t * tiling.NSLAB)
        rem = bt % (t * t * tiling.NSLAB)
        ty = rem // (t * tiling.NSLAB)
        rem2 = rem % (t * tiling.NSLAB)
        tcg = np.stack([
            tx_loc + d * nx, ty,
            (rem2 // tiling.NSLAB) * tiling.NSLAB + rem2 % tiling.NSLAB,
        ], -1).astype(np.int32)
        perm.append(p)
        occ.append(o)
        btile.append(bt)
        tcoords.append(tcg)
    perm_np = np.concatenate(perm)
    occ_np = np.concatenate(occ)
    return {
        "perm": jnp.asarray(perm_np),
        "occupied": jnp.asarray(occ_np),
        "block_tile": jnp.asarray(np.concatenate(btile)),
        "tile_coords": jnp.asarray(np.concatenate(tcoords, axis=0)),
        "n_blocks": nb_local * n_dev,
        "n_blocks_local": nb_local,
        "n_subtiles_local": n_sub,
        "nx": nx,
        "perm_np": perm_np,
        "occupied_np": occ_np,
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "n_substeps", "nx", "n_subtiles",
                     "interpret"),
)
def simulate_substeps_halo_sharded(
    state_padded: MPMState, block_tile, tile_coords, cfg: MPMConfig, bcs,
    time0, dt, n_substeps: int, mesh: Mesh, nx: int, n_subtiles: int,
    interpret: bool = False,
) -> MPMState:
    """A frame of Pallas fast-path substeps with x-slab halo-sharded grid
    (4 one-plane ppermutes per substep; no psum)."""
    assert len(mesh.axis_names) == 1, "halo sharding uses a 1-D mesh"
    ax = mesh.axis_names[0]
    n_dev = mesh.shape[ax]

    sd0 = solver_fast.state_to_soa(state_padded)
    sd_specs = _soa_spec(sd0, (ax,))
    part = P(ax)
    # particle-BC masks in padded layout order shard with the rows (r5:
    # lifts the r4 "use the psum path" restriction — every BC type now runs
    # halo-sharded, matching mpm_solver_warp.py:514-637's BC universality)
    bc_specs = _bc_specs(bcs, state_padded.x.shape[0], part)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(sd_specs, part, P(ax, None), bc_specs),
        out_specs=sd_specs,
        check_vma=False,
    )
    def run(sd: dict, bt, tc, bcs_l) -> dict:
        x_off = jax.lax.axis_index(ax) * nx
        layout = {"block_tile": bt, "tile_coords": tc,
                  "n_subtiles": n_subtiles}

        def grid_fn(windows, t_now):
            return solver_fast.grid_stage_halo(
                windows, cfg, bcs_l, t_now, dt, ax, n_dev, nx, x_off)

        def body(sd, step):
            t_now = time0 + step.astype(jnp.float32) * dt
            sd = solver_fast.p2g2p_fast_soa(
                sd, layout, cfg, bcs_l, t_now, dt,
                interpret=interpret, grid_fn=grid_fn,
            )
            return sd, None

        sd, _ = jax.lax.scan(body, sd, jnp.arange(n_substeps))
        return sd

    sd = run(sd0, jnp.asarray(block_tile), jnp.asarray(tile_coords), bcs)
    return solver_fast.soa_to_state(sd, state_padded)


def rollout_halo_sharded(state: MPMState, cfg: MPMConfig, mesh: Mesh,
                         bcs=(), n_substeps: int = 8, dt: float = 1e-4,
                         time0: float = 0.0,
                         interpret: bool | None = None) -> MPMState:
    """Convenience wrapper: build the x-slab halo layout, shard, run one
    frame of substeps, and unpad back to the original particle order."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(mesh.axis_names) == 1
    n_dev = mesh.shape[mesh.axis_names[0]]
    layout = build_halo_layout(
        np.asarray(state.x), cfg.n_grid, cfg.inv_dx, n_dev)
    padded = solver_fast.pad_state_to_layout(state, layout)

    part = NamedSharding(mesh, _particle_spec(mesh))

    def put(a):
        if a.ndim >= 1 and a.shape[0] == padded.x.shape[0]:
            return jax.device_put(a, part)
        return jax.device_put(a, NamedSharding(mesh, P()))

    padded = jax.tree.map(put, padded)
    bcs = _shard_padded_bcs(
        pad_particle_bcs_for_layout(tuple(bcs), layout), part)
    out = simulate_substeps_halo_sharded(
        padded, layout["block_tile"], layout["tile_coords"], cfg,
        bcs, jnp.float32(time0), jnp.float32(dt), n_substeps, mesh,
        layout["nx"], layout["n_subtiles_local"], interpret=interpret,
    )
    return solver_fast.unpad_state(out, layout, state.n_particles)
