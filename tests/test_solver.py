"""MPM solver physics invariants and BC behaviors."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.sim.bc import (
    BoundingBox,
    make_cuboid_velocity,
    make_particle_impulse,
    make_particle_translation,
    make_surface_collider,
)
from pixie_tpu.sim.solver import (
    MPMSolver,
    compute_cov_from_F,
    p2g,
    p2g2p,
    simulate_substeps,
)
from pixie_tpu.sim.types import MPMConfig, finalize_mu_lam, make_state


def block_state(n=512, lo=0.8, hi=1.2, E=1e5, nu=0.3, density=200.0, seed=0,
                material=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    vol = np.full(n, ((hi - lo) ** 3) / n, np.float32)
    st = make_state(x, vol, density=density, E=E, nu=nu, material=material)
    return finalize_mu_lam(st)


CFG = MPMConfig(n_grid=32, grid_lim=2.0)


class TestTransferInvariants:
    def test_p2g_conserves_mass(self):
        st = block_state()
        grid = p2g(st, CFG, 1e-4)
        np.testing.assert_allclose(
            float(grid[..., 3].sum()), float(st.mass.sum()), rtol=1e-5
        )

    def test_p2g_conserves_momentum(self):
        st = block_state()
        v = np.random.default_rng(1).normal(size=st.v.shape).astype(np.float32)
        st = st.replace(v=jnp.asarray(v))
        grid = p2g(st, CFG, 1e-4)
        # stress is zero at F=I, C=0: grid momentum == particle momentum
        mom_grid = np.asarray(grid[..., :3].sum((0, 1, 2)))
        mom_part = np.asarray((st.mass[:, None] * st.v).sum(0))
        np.testing.assert_allclose(mom_grid, mom_part, rtol=1e-4, atol=1e-6)

    def test_substep_conserves_momentum_without_forces(self):
        st = block_state()
        v = np.random.default_rng(2).normal(size=st.v.shape).astype(np.float32) * 0.1
        st = st.replace(v=jnp.asarray(v), E=jnp.zeros_like(st.E))
        st = finalize_mu_lam(st.replace(nu=jnp.full_like(st.nu, 0.3)))
        mom0 = np.asarray((st.mass[:, None] * st.v).sum(0))
        out = p2g2p(st, CFG, (), jnp.float32(0.0), jnp.float32(1e-4))
        mom1 = np.asarray((out.mass[:, None] * out.v).sum(0))
        np.testing.assert_allclose(mom1, mom0, rtol=1e-3, atol=1e-6)

    def test_single_particle_free_fall_is_exact(self):
        """One particle, gravity only: v = g t, F stays I (partition of unity)."""
        st = make_state(np.array([[1.0, 1.0, 1.0]]), np.array([1e-6]), density=100.0,
                        E=1e5, nu=0.3)
        st = finalize_mu_lam(st)
        cfg = MPMConfig(n_grid=32, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
        dt, steps = 1e-4, 50
        out = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(dt), steps)
        np.testing.assert_allclose(
            float(out.v[0, 2]), -9.8 * dt * steps, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.F[0]), np.eye(3), atol=1e-5
        )

    def test_rollout_is_deterministic(self):
        st = block_state()
        cfg = MPMConfig(n_grid=32, grid_lim=2.0, gravity=(0.0, 0.0, -9.8))
        a = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(1e-4), 20)
        b = simulate_substeps(st, cfg, (), jnp.float32(0.0), jnp.float32(1e-4), 20)
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))

    def test_elastic_block_stays_finite_and_bounded(self):
        st = block_state(E=2e5, nu=0.4)
        cfg = MPMConfig(n_grid=32, grid_lim=2.0, gravity=(0.0, 0.0, -9.8),
                        active_materials=(0,))
        bcs = (make_surface_collider([0, 0, 0.1], [0, 0, 1], "sticky"),)
        out = simulate_substeps(st, cfg, bcs, jnp.float32(0.0), jnp.float32(1e-4), 400)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        assert x[:, 2].min() > 0.0
        assert x.max() < 2.0


class TestBCs:
    def test_sticky_surface_zeroes_below_plane(self):
        bc = make_surface_collider([0, 0, 1.0], [0, 0, 1], "sticky")
        g = 8
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.ones((g, g, g, 3))
        out = np.asarray(bc.apply(jnp.float32(0.0), 1e-4, v, node_x, cfg))
        z = np.asarray(node_x[..., 2])
        assert (out[z < 1.0] == 0).all()
        assert (out[z >= 1.0] == 1).all()

    def test_slip_surface_legacy_zeroing(self):
        """This fork zeroes slip surfaces too (mpm_solver_warp.py:838-840)."""
        bc = make_surface_collider([0, 0, 1.0], [0, 0, 1], "slip")
        g = 8
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.ones((g, g, g, 3))
        out = np.asarray(bc.apply(jnp.float32(0.0), 1e-4, v, node_x, cfg))
        z = np.asarray(node_x[..., 2])
        assert (out[z < 1.0] == 0).all()

    def test_slip_surface_standard_projection(self):
        bc = make_surface_collider([0, 0, 1.0], [0, 0, 1], "slip").replace(
            legacy_zero_velocity=False
        )
        g = 8
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.ones((g, g, g, 3))
        out = np.asarray(bc.apply(jnp.float32(0.0), 1e-4, v, node_x, cfg))
        z = np.asarray(node_x[..., 2])
        # below plane: normal (z) removed, tangential kept
        np.testing.assert_allclose(out[z < 1.0][:, 2], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[z < 1.0][:, 0], 1.0, atol=1e-6)

    def test_cuboid_sets_velocity_inside(self):
        bc = make_cuboid_velocity([1, 1, 1], [0.25, 0.25, 0.25], [0, 0, 0.5])
        g = 8
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.zeros((g, g, g, 3))
        out = np.asarray(bc.apply(jnp.float32(0.0), 1e-4, v, node_x, cfg))
        inside = np.all(np.abs(np.asarray(node_x) - 1.0) < 0.25, axis=-1)
        assert (out[inside][:, 2] == 0.5).all()
        assert (out[~inside] == 0).all()

    def test_cuboid_inactive_after_end_time(self):
        bc = make_cuboid_velocity([1, 1, 1], [2, 2, 2], [1, 0, 0], end_time=0.5)
        g = 4
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.full((g, g, g, 3), 7.0)
        out = np.asarray(bc.apply(jnp.float32(1.0), 1e-4, v, node_x, cfg))
        np.testing.assert_array_equal(out, 7.0)

    def test_moving_cuboid_tracks_velocity(self):
        bc = make_cuboid_velocity([0.5, 1, 1], [0.2, 0.2, 0.2], [1.0, 0, 0],
                                  start_time=0.0, end_time=10.0)
        g = 16
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.zeros((g, g, g, 3))
        # at t=1.0 the cuboid center has moved to x=1.5
        out = np.asarray(bc.apply(jnp.float32(1.0), 1e-4, v, node_x, cfg))
        moved_inside = np.all(
            np.abs(np.asarray(node_x) - np.array([1.5, 1, 1])) < 0.2, axis=-1
        )
        assert (out[moved_inside][:, 0] == 1.0).all()

    def test_bounding_box_clamps_outward(self):
        bc = BoundingBox()
        g = 16
        cfg = MPMConfig(n_grid=g, grid_lim=2.0)
        idx = jnp.arange(g, dtype=jnp.float32) * cfg.dx
        node_x = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        v = jnp.full((g, g, g, 3), -1.0)  # all moving toward low faces
        out = np.asarray(bc.apply(jnp.float32(0.0), 1e-4, v, node_x, cfg))
        assert (out[:3, :, :, 0] == 0).all()       # low-x padding clamped
        assert (out[3:, :, :, 0] == -1.0).all()    # interior untouched
        assert (out[:, :3, :, 1] == 0).all()
        assert (out[:, :, :3, 2] == 0).all()

    def test_particle_impulse_window(self):
        st = block_state(n=16)
        bc = make_particle_impulse(
            np.asarray(st.x), force=[0, 0, 1e-3], dt=1e-4,
            point=[1, 1, 1], size=[1, 1, 1], num_dt=5, start_time=0.0,
        )
        assert int(np.asarray(bc.mask).sum()) == 16
        out = bc.apply(jnp.float32(0.0), jnp.float32(1e-4), st)
        dv = np.asarray(out.v[:, 2])
        expected = 1e-3 / np.asarray(st.mass) * 1e-4
        np.testing.assert_allclose(dv, expected, rtol=1e-5)
        # after the window, no effect
        out2 = bc.apply(jnp.float32(1.0), jnp.float32(1e-4), st)
        np.testing.assert_array_equal(np.asarray(out2.v), np.asarray(st.v))

    def test_particle_translation_pins_velocity(self):
        st = block_state(n=32)
        bc = make_particle_translation(
            np.asarray(st.x), point=[1, 1, 1], size=[10, 10, 10],
            velocity=[0.0, 0.0, 0.0], start_time=0.0, end_time=1.0,
        )
        st = st.replace(v=jnp.ones_like(st.v))
        out = bc.apply(jnp.float32(0.5), jnp.float32(1e-4), st)
        np.testing.assert_array_equal(np.asarray(out.v), 0.0)


class TestSolverFacade:
    def test_end_to_end_rollout_with_material_field(self):
        rng = np.random.default_rng(3)
        n = 256
        x = rng.uniform(0.8, 1.2, (n, 3)).astype(np.float32)
        solver = MPMSolver()
        solver.load_initial_data(x, np.full(n, 1e-6, np.float32), n_grid=25, grid_lim=2.0)
        solver.set_parameters_dict(
            {"material": "jelly", "E": 2e5, "nu": 0.4, "density": 200.0,
             "g": [0.0, 0.0, -4.0], "grid_v_damping_scale": 0.9999}
        )
        # per-particle override: half the particles metal
        dens = np.full(n, 200.0, np.float32)
        E = np.full(n, 2e5, np.float32)
        nu = np.full(n, 0.4, np.float32)
        mats = np.zeros(n, np.int32)
        mats[: n // 2] = 1
        solver.set_per_particle_materials(dens, E, nu, mats)
        solver.state = solver.state.replace(
            yield_stress=jnp.full((n,), 1e4, jnp.float32)
        )
        solver.finalize_mu_lam()
        solver.set_velocity_on_cuboid([1, 1, 0.75], [0.6, 0.6, 0.05], [0, 0, 0],
                                      start_time=0, end_time=1e9, reset=1)
        solver.step_frame(50, 1e-4)
        x_out = solver.export_particle_x()
        assert np.isfinite(x_out).all()
        assert solver.cfg.active_materials == (0, 1)

    def test_additional_material_params_region(self):
        from pixie_tpu.sim.solver import apply_additional_params

        st = block_state(n=64)
        out = apply_additional_params(
            st,
            {"point": [1.0, 1.0, 1.0], "size": [10, 10, 10], "E": 7e6,
             "nu": 0.25, "density": 555.0, "material": "sand"},
        )
        assert (np.asarray(out.E) == 7e6).all()
        assert (np.asarray(out.material) == 2).all()
        assert (np.asarray(out.density) == 555.0).all()

    def test_cov_from_f_identity(self):
        st = block_state(n=8)
        init = np.tile(np.array([1.0, 0, 0, 1.0, 0, 1.0], np.float32), (8, 1))
        st = st.replace(init_cov=jnp.asarray(init))
        cov = np.asarray(compute_cov_from_F(st))
        np.testing.assert_allclose(cov, init, atol=1e-6)


class TestParams:
    def test_decode_defaults(self):
        from pixie_tpu.sim.params import decode_params

        mat, bc, time_p, prep, cam = decode_params({})
        assert mat["n_grid"] == 50 and mat["grid_lim"] == 2.0
        assert mat["E"] == 1e5 and mat["nu"] == 0.4 and mat["density"] == 200.0
        assert time_p["substep_dt"] == 1e-4 and time_p["frame_num"] == 100
        assert prep["fix_ground"] is True and prep["opacity_threshold"] == 0.02
        assert cam["mpm_space_viewpoint_center"] == [1.0, 1.0, 1.0]

    def test_decode_reference_config(self):
        """The reference's shipped scene JSONs decode unchanged."""
        import json
        from pathlib import Path

        from pixie_tpu.sim.params import decode_param_json

        ref = Path("/root/reference/third_party/PhysGaussian/config/objaverse/custom_tree_config.json")
        if not ref.exists():
            pytest.skip("reference not mounted")
        mat, bc, time_p, prep, cam = decode_param_json(ref)
        raw = json.loads(ref.read_text())
        assert mat["material"] == raw["material"]
        assert time_p["frame_num"] == raw["frame_num"]
        assert isinstance(bc, list) and len(bc) >= 1

    def test_invalid_nu_raises(self):
        from pixie_tpu.sim.params import decode_params

        with pytest.raises(ValueError):
            decode_params({"nu": 0.7})

    def test_all_shipped_configs_decode_and_bcs_build(self):
        """Every per-class scene JSON shipped in config/ decodes and its
        boundary conditions compile into the static BC schema."""
        from pathlib import Path

        from pixie_tpu.sim.bc import build_boundary_conditions
        from pixie_tpu.sim.params import decode_param_json

        root = Path(__file__).resolve().parents[1] / "config"
        cfgs = sorted((root / "objaverse").glob("custom_*_config.json")) + sorted(
            (root / "real_scene").glob("custom_*_config.json")
        )
        assert len(cfgs) == 22, f"expected 22 shipped scene configs, found {len(cfgs)}"
        positions = np.random.default_rng(0).uniform(0.5, 1.5, (64, 3)).astype(np.float32)
        for cfg_path in cfgs:
            mat, bc, time_p, prep, cam = decode_param_json(cfg_path)
            assert 0.0 <= mat["nu"] <= 0.5
            assert time_p["frame_num"] > 0
            if isinstance(bc, list) and bc:
                built = build_boundary_conditions(bc, time_p, positions)
                assert len(built) == len(bc), cfg_path.name


class TestBCsFromJson:
    def test_build_all_bc_types(self):
        from pixie_tpu.sim.bc import build_boundary_conditions

        positions = np.random.default_rng(0).uniform(0.5, 1.5, (64, 3)).astype(np.float32)
        bc_params = [
            {"type": "cuboid", "point": [1, 1, 1], "size": [0.2, 0.2, 0.2],
             "velocity": [0, 0, 0], "reset": 1},
            {"type": "particle_impulse", "force": [0, 0, 1], "num_dt": 3},
            {"type": "bounding_box"},
            {"type": "enforce_particle_translation", "point": [1, 1, 1],
             "size": [1, 1, 1], "velocity": [0, 0, 0], "start_time": 0,
             "end_time": 1},
            {"type": "surface_collider", "point": [0, 0, 0.1], "normal": [0, 0, 1],
             "surface": "sticky", "friction": 0.0, "start_time": 0, "end_time": 1e3},
            {"type": "release_particles_sequentially", "normal": [0, 0, 1],
             "start_position": 1.5, "end_position": 0.5, "num_layers": 10,
             "start_time": 0, "end_time": 1.0},
            {"type": "enforce_particle_velocity_rotation", "point": [1, 1, 1],
             "normal": [0, 0, 1], "half_height_and_radius": [0.5, 0.5],
             "rotation_scale": 1.0, "translation_scale": 0.0,
             "start_time": 0, "end_time": 1},
        ]
        bcs = build_boundary_conditions(bc_params, {"substep_dt": 1e-4}, positions)
        # release_particles_sequentially expands to 50 (reference hard-codes 50)
        assert len(bcs) == 6 + 50
        with pytest.raises(TypeError):
            build_boundary_conditions([{"type": "nope"}], {"substep_dt": 1e-4}, positions)
