"""Particle filling tests: parity ray-casts, volume, attribute inheritance."""

import jax.numpy as jnp
import numpy as np

from pixie_tpu.sim.filling import (
    densify_grids,
    fill_particles,
    get_particle_volume,
    init_filled_particles,
    internal_cells_mask,
)


def hollow_shell_grids(n=16, r_out=6, r_in=4, center=None):
    """Occupancy of a hollow sphere shell; returns (count, density)."""
    c = center if center is not None else n / 2
    idx = np.arange(n) + 0.5
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    shell = (r <= r_out) & (r >= r_in)
    density = shell.astype(np.float32) * 10.0
    count = shell.astype(np.int32)
    return count, density, r


class TestInternalMask:
    def test_hollow_sphere_interior_detected(self):
        count, density, r = hollow_shell_grids()
        mask = np.asarray(
            internal_cells_mask(jnp.asarray(count), jnp.asarray(density), 1.0)
        )
        # strictly interior cells must be marked
        assert mask[(r < 3.0)].all()
        # far-outside cells must not
        assert not mask[(r > 7.5)].any()

    def test_open_box_not_filled_along_open_direction(self):
        """A box missing its +z face: rays along +z escape -> even parity."""
        n = 12
        density = np.zeros((n, n, n), np.float32)
        density[3:9, 3:9, 3] = 10.0   # bottom
        density[3, 3:9, 3:9] = 10.0   # four walls
        density[8, 3:9, 3:9] = 10.0
        density[3:9, 3, 3:9] = 10.0
        density[3:9, 8, 3:9] = 10.0
        count = (density > 0).astype(np.int32)
        mask = np.asarray(
            internal_cells_mask(jnp.asarray(count), jnp.asarray(density), 1.0,
                                exclude_dir=5, ray_cast_dir=4)
        )
        # cavity cells see no occupancy above (+z open) -> not enclosed
        assert not mask[5, 5, 5]


class TestDensify:
    def test_counts_and_density(self, rng):
        n = 200
        pos = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
        opacity = np.ones(n, np.float32)
        cov_upper = np.tile(
            np.array([1e-4, 0, 0, 1e-4, 0, 1e-4], np.float32), (n, 1)
        )
        count, density = densify_grids(pos, opacity, cov_upper, 16, 1.0 / 16)
        assert count.sum() == n
        assert density.max() > 0


class TestVolume:
    def test_volume_partitions_cells(self, rng):
        pos = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
        vol = get_particle_volume(pos, 8, 1.0 / 8)
        assert vol.shape == (64,)
        assert (vol > 0).all()
        # particles alone in their cell get the full cell volume
        lone = np.array([[0.01, 0.01, 0.01]], np.float32)
        v = get_particle_volume(lone, 8, 1.0 / 8)
        np.testing.assert_allclose(v[0], (1.0 / 8) ** 3, rtol=1e-6)

    def test_uniform_mode(self, rng):
        pos = rng.uniform(0.1, 0.9, (32, 3)).astype(np.float32)
        v = get_particle_volume(pos, 8, 1.0 / 8, uniform=True)
        assert np.allclose(v, v[0])


class TestFillPipeline:
    def test_fills_hollow_shell(self, rng):
        """Gaussians on a spherical shell -> filling adds interior particles."""
        n_surf = 800
        dirs = rng.normal(size=(n_surf, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        pos = (0.5 + 0.3 * dirs).astype(np.float32)  # shell radius 0.3 in unit box
        opacity = np.ones(n_surf, np.float32)
        cov_upper = np.tile(
            np.array([4e-4, 0, 0, 4e-4, 0, 4e-4], np.float32), (n_surf, 1)
        )
        grid_n = 24
        new = fill_particles(
            pos, opacity, cov_upper, grid_n=grid_n, max_samples=5000,
            grid_dx=1.0 / grid_n, density_thres=0.5, search_thres=0.5,
            max_particles_per_cell=1, seed=0,
        )
        assert len(new) > 0
        # some of the new particles must be deep inside the shell
        r = np.linalg.norm(new - 0.5, axis=1)
        assert (r < 0.2).sum() > 0

    def test_budget_respected(self, rng):
        n_surf = 100
        pos = rng.uniform(0.3, 0.7, (n_surf, 3)).astype(np.float32)
        opacity = np.ones(n_surf, np.float32)
        cov_upper = np.tile(np.array([1e-3, 0, 0, 1e-3, 0, 1e-3], np.float32),
                            (n_surf, 1))
        new = fill_particles(
            pos, opacity, cov_upper, grid_n=16, max_samples=n_surf + 10,
            grid_dx=1.0 / 16, density_thres=0.1, search_thres=0.1, seed=0,
        )
        assert len(new) <= 10


class TestAttributeInheritance:
    def test_nearest_attrs(self):
        orig = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)
        attrs = {"opacity": np.array([0.2, 0.9], np.float32),
                 "shs": np.array([[1, 1, 1], [2, 2, 2]], np.float32)}
        new = np.array([[0.1, 0, 0], [0.9, 0, 0]], np.float32)
        out = init_filled_particles(new, orig, attrs)
        np.testing.assert_allclose(out["opacity"], [0.2, 0.9])
        np.testing.assert_allclose(out["shs"][1], [2, 2, 2])

    def test_empty_new(self):
        out = init_filled_particles(
            np.zeros((0, 3)), np.zeros((2, 3)),
            {"opacity": np.array([0.1, 0.2])},
        )
        assert out["opacity"].shape == (0,)
