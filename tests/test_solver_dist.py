"""Multi-chip MPM: sharded-particle substeps on the virtual 8-device mesh
must match the single-device path numerically (pixie_tpu/sim/solver_dist.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixie_tpu.parallel.mesh import get_mesh
from pixie_tpu.sim.bc import make_surface_collider
from pixie_tpu.sim.solver import simulate_substeps
from pixie_tpu.sim.solver_dist import shard_particles, simulate_substeps_sharded
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


def _state(n, seed=0, material=0, **kw):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.7, 1.3, (n, 3)).astype(np.float32)
    return finalize_mu_lam(make_state(
        x, np.full(n, 1e-6, np.float32), density=300.0, E=2e5, nu=0.35,
        material=material, **kw,
    ))


class TestShardedSolver:
    def test_matches_single_device_10k(self):
        """10k particles, 30 substeps: sharded == single-device (verdict #7)."""
        n = 10_000
        st = _state(n)
        cfg = MPMConfig(n_grid=32, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        ref = simulate_substeps(st, cfg, (), jnp.float32(0.0),
                                jnp.float32(1e-4), 30)

        mesh = get_mesh(dp=4, sp=2)
        sharded = shard_particles(mesh, _state(n))
        out = simulate_substeps_sharded(sharded, cfg, (), jnp.float32(0.0),
                                        jnp.float32(1e-4), 30, mesh)
        got = np.asarray(out.x)[:n]
        np.testing.assert_allclose(got, np.asarray(ref.x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v)[:n], np.asarray(ref.v),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.F)[:n], np.asarray(ref.F),
                                   atol=1e-6)

    def test_padding_particles_inert(self):
        """N not divisible by the mesh: padded particles stay inert."""
        n = 1003  # prime-ish, pads to 1008 on 8 devices
        mesh = get_mesh(dp=8, sp=1)
        st = shard_particles(mesh, _state(n, seed=1))
        assert st.x.shape[0] % 8 == 0
        assert int(np.asarray(st.selection)[n:].min()) == 1
        cfg = MPMConfig(n_grid=24, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        out = simulate_substeps_sharded(st, cfg, (), jnp.float32(0.0),
                                        jnp.float32(1e-4), 10, mesh)
        # padded rows never move and contribute nothing
        pad_x = np.asarray(out.x)[n:]
        np.testing.assert_array_equal(pad_x, np.asarray(st.x)[n:])
        ref = simulate_substeps(_state(n, seed=1), cfg, (), jnp.float32(0.0),
                                jnp.float32(1e-4), 10)
        np.testing.assert_allclose(np.asarray(out.x)[:n], np.asarray(ref.x),
                                   atol=1e-6)

    def test_with_grid_bcs_and_sand(self):
        """Grid BCs (replicated) + sand return mapping under sharding."""
        n = 4096
        cfg = MPMConfig(n_grid=24, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(2,))
        bcs = (make_surface_collider((1.0, 1.0, 0.6), (0.0, 0.0, 1.0),
                                     surface="sticky"),)
        ref = simulate_substeps(_state(n, seed=2, material=2), cfg, bcs,
                                jnp.float32(0.0), jnp.float32(1e-4), 25)
        mesh = get_mesh(dp=2, sp=4)
        st = shard_particles(mesh, _state(n, seed=2, material=2))
        out = simulate_substeps_sharded(st, cfg, bcs, jnp.float32(0.0),
                                        jnp.float32(1e-4), 25, mesh)
        np.testing.assert_allclose(np.asarray(out.x)[:n], np.asarray(ref.x),
                                   atol=1e-6)
        # the sand return mapping branches on delta_gamma/tr > 0; psum
        # reordering can flip that branch for borderline particles, so F is
        # compared statistically: >=99% of entries track at 1e-6, none blow up
        diff = np.abs(np.asarray(out.F)[:n] - np.asarray(ref.F))
        assert (diff <= 1e-6).mean() > 0.99
        assert diff.max() < 5e-2

    def test_fast_path_matches_single_device(self):
        """The production Pallas fast path under shard_map (verdict r2 #7):
        sharded tile-sorted substeps == single-device FastMPMSolver."""
        from pixie_tpu.sim.solver_dist import rollout_fast_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 20_000
        cfg = MPMConfig(n_grid=32, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        solo = FastMPMSolver(_state(n, seed=4), cfg, bcs=(), interpret=True)
        solo.step_frame(12, 1e-4)
        ref = solo.state

        mesh = get_mesh(dp=4, sp=2)
        out = rollout_fast_sharded(_state(n, seed=4), cfg, mesh,
                                   n_substeps=12, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F),
                                   atol=1e-6)

    def test_fast_path_with_grid_bcs(self):
        """Fast path sharded with a surface collider (grid BCs replicated)."""
        from pixie_tpu.sim.solver_dist import rollout_fast_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 6000
        cfg = MPMConfig(n_grid=24, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        bcs = (make_surface_collider((1.0, 1.0, 0.6), (0.0, 0.0, 1.0),
                                     surface="sticky"),)
        solo = FastMPMSolver(_state(n, seed=5), cfg, bcs=bcs, interpret=True)
        solo.step_frame(10, 1e-4)
        ref = solo.state

        mesh = get_mesh(dp=8, sp=1)
        out = rollout_fast_sharded(_state(n, seed=5), cfg, mesh, bcs=bcs,
                                   n_substeps=10, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)

    def test_output_stays_sharded(self):
        """The result keeps the particle sharding (no implicit gather)."""
        mesh = get_mesh(dp=8, sp=1)
        st = shard_particles(mesh, _state(800, seed=3))
        cfg = MPMConfig(n_grid=16, grid_lim=2.0, active_materials=(0,))
        out = simulate_substeps_sharded(st, cfg, (), jnp.float32(0.0),
                                        jnp.float32(1e-4), 5, mesh)
        shard_axes = {s for s in out.x.sharding.spec if s is not None}
        assert shard_axes, "particle axis lost its sharding"


class TestHaloSharded:
    """x-slab halo-sharded fast path (grid + particles sharded; 4 one-plane
    ppermutes per substep instead of the full-grid psum)."""

    def test_halo_matches_single_device(self):
        from jax.sharding import Mesh

        from pixie_tpu.sim.solver_dist import rollout_halo_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 20_000
        # n_grid=96 -> t=8 x-tiles, one per virtual device
        cfg = MPMConfig(n_grid=96, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        solo = FastMPMSolver(_state(n, seed=6), cfg, bcs=(), interpret=True)
        solo.step_frame(10, 1e-4)
        ref = solo.state

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        out = rollout_halo_sharded(_state(n, seed=6), cfg, mesh,
                                   n_substeps=10, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F),
                                   atol=1e-6)

    def test_halo_with_grid_bcs(self):
        """Halo path with a surface collider: the BC sees node positions of
        the device's own x-slab (global offset via axis_index)."""
        from jax.sharding import Mesh

        from pixie_tpu.sim.solver_dist import rollout_halo_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 6000
        cfg = MPMConfig(n_grid=48, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        bcs = (make_surface_collider((1.0, 1.0, 0.6), (0.0, 0.0, 1.0),
                                     surface="sticky"),)
        solo = FastMPMSolver(_state(n, seed=7), cfg, bcs=bcs, interpret=True)
        solo.step_frame(10, 1e-4)
        ref = solo.state

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        out = rollout_halo_sharded(_state(n, seed=7), cfg, mesh, bcs=bcs,
                                   n_substeps=10, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)

    def test_halo_layout_invariants(self):
        """Per-device equal block counts; local ids within range; every
        occupied slot's particle inside its device's x-slab."""
        from pixie_tpu.ops import tiling
        from pixie_tpu.sim.solver_dist import build_halo_layout

        rng = np.random.default_rng(11)
        x = rng.uniform(0.2, 1.8, (30_000, 3)).astype(np.float32)
        n_grid, n_dev = 96, 8
        inv_dx = n_grid / 2.0
        lay = build_halo_layout(x, n_grid, inv_dx, n_dev)
        t = tiling.n_tiles(n_grid)
        nx = lay["nx"]
        assert nx * n_dev == t
        nb = lay["n_blocks_local"]
        bt = np.asarray(lay["block_tile"]).reshape(n_dev, nb)
        assert bt.max() < lay["n_subtiles_local"]
        perm = np.asarray(lay["perm"]).reshape(n_dev, nb * tiling.PBLK)
        occ = np.asarray(lay["occupied"]).reshape(n_dev, nb * tiling.PBLK) > 0
        base = np.floor(x * inv_dx - 0.5).astype(np.int32)
        tcx = np.clip(base[:, 0] // tiling.TILE, 0, t - 1)
        for d in range(n_dev):
            got = perm[d][occ[d]]
            assert (tcx[got] // nx == d).all()
        # all particles appear exactly once
        allp = np.sort(np.concatenate([perm[d][occ[d]] for d in range(n_dev)]))
        np.testing.assert_array_equal(allp, np.arange(len(x)))


class TestShardedParticleBCs:
    def test_impulse_on_fast_psum_path(self):
        """Particle BCs on the Pallas fast path under shard_map: masks are
        gathered through the layout permutation (pad_particle_bcs_for_layout)
        and shard with the rows — parity vs single-device FastMPMSolver."""
        from pixie_tpu.sim.bc import ParticleImpulse
        from pixie_tpu.sim.solver_dist import rollout_fast_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 8000
        st = _state(n, seed=8)
        mask = (np.asarray(st.x)[:, 2] > 1.0).astype(np.float32)
        bc = ParticleImpulse(
            force=jnp.array([0.0, 0.0, 20.0]), mask=jnp.asarray(mask),
            start_time=0.0, end_time=1.0)
        cfg = MPMConfig(n_grid=24, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        solo = FastMPMSolver(_state(n, seed=8), cfg, bcs=(bc,),
                             interpret=True)
        solo.step_frame(8, 1e-4)
        ref = solo.state

        mesh = get_mesh(dp=4, sp=2)
        out = rollout_fast_sharded(_state(n, seed=8), cfg, mesh, bcs=(bc,),
                                   n_substeps=8, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)

    def test_impulse_on_halo_path(self):
        """Particle BCs on the x-slab halo-sharded path (r4 verdict missing
        #3: the tree config's impulse must run halo-sharded) — parity vs
        single-device FastMPMSolver, assert lifted."""
        from jax.sharding import Mesh

        from pixie_tpu.sim.bc import ParticleImpulse
        from pixie_tpu.sim.solver_dist import rollout_halo_sharded
        from pixie_tpu.sim.solver_fast import FastMPMSolver

        n = 12_000
        st = _state(n, seed=9)
        mask = (np.asarray(st.x)[:, 2] > 1.0).astype(np.float32)
        bc = ParticleImpulse(
            force=jnp.array([0.0, 0.0, 20.0]), mask=jnp.asarray(mask),
            start_time=0.0, end_time=1.0)
        cfg = MPMConfig(n_grid=96, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        solo = FastMPMSolver(_state(n, seed=9), cfg, bcs=(bc,),
                             interpret=True)
        solo.step_frame(8, 1e-4)
        ref = solo.state

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        out = rollout_halo_sharded(_state(n, seed=9), cfg, mesh, bcs=(bc,),
                                   n_substeps=8, dt=1e-4, interpret=True)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   atol=1e-4)
        m = mask > 0
        vz = np.asarray(out.v)[:, 2]
        assert vz[m].mean() > vz[~m].mean()  # the impulse actually applied

    def test_impulse_mask_sharded_with_particles(self):
        """Particle-BC masks live OUTSIDE the state pytree; shard_particles
        must pad + shard them alongside the rows (regression: a replicated
        full-length mask broadcast against N/n_dev-row shards and crashed)."""
        from pixie_tpu.sim.bc import ParticleImpulse

        n = 500  # NOT a multiple of 8: exercises mask padding
        st = _state(n)
        x = np.asarray(st.x)
        mask = (x[:, 2] > 1.0).astype(np.float32)
        bc = ParticleImpulse(
            force=jnp.array([0.0, 0.0, 20.0]), mask=jnp.asarray(mask),
            start_time=0.0, end_time=1.0)
        cfg = MPMConfig(n_grid=24, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))

        ref = simulate_substeps(st, cfg, (bc,), jnp.float32(0.0),
                                jnp.float32(1e-4), 5)

        mesh = get_mesh(dp=4, sp=2)
        sharded, bcs_s = shard_particles(mesh, _state(n), (bc,))
        out = simulate_substeps_sharded(sharded, cfg, bcs_s, jnp.float32(0.0),
                                        jnp.float32(1e-4), 5, mesh)
        vr, vf = np.asarray(ref.v), np.asarray(out.v)[:n]
        assert np.abs(vr - vf).max() / np.abs(vr).max() < 1e-5
        m = mask > 0
        assert vf[m, 2].mean() > 10.0 * max(abs(vf[~m, 2].mean()), 1e-3)
