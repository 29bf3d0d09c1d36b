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
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixie_tpu.sim import bc as bc_mod
from pixie_tpu.sim.solver import compute_stress_from_F_trial, g2p, grid_update, p2g
from pixie_tpu.sim.types import MPMConfig, MPMState


def _particle_spec(mesh: Mesh) -> P:
    """Shard the particle axis over ALL mesh axes."""
    return P(tuple(mesh.axis_names))


def shard_particles(mesh: Mesh, state: MPMState) -> MPMState:
    """Pad N to a multiple of the mesh size (padding marked selection=1, i.e.
    excluded from simulation exactly like the reference's particle_selection,
    mpm_solver_warp.py kernels) and place every per-particle array sharded."""
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

    return jax.tree.map(put, state)


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

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(state_specs,), out_specs=state_specs,
        check_rep=False,
    )
    def run(st: MPMState) -> MPMState:
        def body(carry, step):
            st = carry
            t = time0 + step.astype(jnp.float32) * dt
            for b in bcs:
                if isinstance(b, bc_mod.PARTICLE_BC_TYPES):
                    st = b.apply(t, dt, st)
            st = compute_stress_from_F_trial(st, cfg, dt)
            grid = p2g(st, cfg, dt)               # local shard's scatter
            grid = jax.lax.psum(grid, axes)       # the one collective
            grid_v = grid_update(grid, cfg, dt, t, bcs)  # replicated compute
            st = g2p(st, grid_v, cfg, dt)
            return st, None

        st, _ = jax.lax.scan(body, st, jnp.arange(n_substeps))
        return st

    return run(state)
