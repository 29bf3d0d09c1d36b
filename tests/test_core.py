"""Core substrate tests: config composition, normalization, PLY I/O, metrics."""

import numpy as np
import pytest

from pixie_tpu.config import compose
from pixie_tpu.utils.io import (
    MATERIAL_PLY_DTYPE,
    load_material_ply,
    make_material_vertex,
    read_ply,
    write_ply,
)
from pixie_tpu.utils.metrics import compute_accuracy, masked_mean
from pixie_tpu.utils.norm import (
    REFERENCE_RANGES,
    normalize_material_grid,
    unscale_prediction,
)


class TestConfig:
    def test_compose_defaults(self):
        cfg = compose()
        assert cfg.training.default_grid_size == 64
        assert cfg.training.background_id == 7
        assert cfg.voxelization.grid_size == 64
        assert cfg.material_mode == "neural"

    def test_nested_interpolation(self):
        # ${training.features.${training.feature_type}.feature_channels}
        cfg = compose()
        assert cfg.training.feature_channels == 768
        assert cfg.training.cond_dim == 32

    def test_interpolation_follows_override(self):
        cfg = compose(overrides=["training.feature_type=rgb"])
        assert cfg.training.feature_channels == 3

    def test_dotlist_override_types(self):
        cfg = compose(overrides=["training.training.lr=0.01", "overwrite=true"])
        assert cfg.training.training.lr == 0.01
        assert cfg.overwrite is True

    def test_path_interpolation(self):
        cfg = compose(overrides=["paths.base_path=/tmp/x"])
        assert cfg.paths.data_dir == "/tmp/x/data"


class TestNormalization:
    def test_roundtrip(self, rng):
        """normalize -> unscale must recover in-range values."""
        d, h, w = 4, 4, 4
        density = 10 ** rng.uniform(
            REFERENCE_RANGES.density_min + 0.1, REFERENCE_RANGES.density_max - 0.1, (d, h, w)
        )
        E = 10 ** rng.uniform(
            REFERENCE_RANGES.E_min + 0.1, REFERENCE_RANGES.E_max - 0.1, (d, h, w)
        )
        nu = rng.uniform(
            REFERENCE_RANGES.nu_min + 0.01, REFERENCE_RANGES.nu_max - 0.01, (d, h, w)
        )
        mat_id = rng.integers(0, 8, (d, h, w))
        mat = np.stack([density, E, nu, mat_id], axis=-1).astype(np.float32)

        cont, ids = normalize_material_grid(mat, REFERENCE_RANGES)
        assert cont.min() >= -1.0 and cont.max() <= 1.0
        assert (ids == mat_id).all()

        pred = np.concatenate(
            [np.moveaxis(cont, -1, 0), np.zeros((8, d, h, w), np.float32)], axis=0
        )
        out = unscale_prediction(pred, REFERENCE_RANGES)
        np.testing.assert_allclose(out[0], density, rtol=2e-3)
        np.testing.assert_allclose(out[1], E, rtol=2e-3)
        np.testing.assert_allclose(out[2], nu, rtol=1e-4, atol=1e-5)

    def test_unscale_clips_out_of_range(self):
        pred = np.full((11, 2, 2, 2), 5.0, np.float32)
        out = unscale_prediction(pred, REFERENCE_RANGES)
        assert np.allclose(np.log10(out[0]), REFERENCE_RANGES.density_max, atol=1e-4)
        # categorical channels untouched
        assert (out[3:] == 5.0).all()


class TestPlyIO:
    def test_roundtrip_binary(self, tmp_path, rng):
        n = 100
        v = make_material_vertex(
            coords=rng.normal(size=(n, 3)).astype(np.float32),
            density=rng.uniform(100, 1000, n).astype(np.float32),
            E=rng.uniform(1e4, 1e6, n).astype(np.float32),
            nu=rng.uniform(0.2, 0.45, n).astype(np.float32),
            material_id=rng.integers(0, 7, n),
            conf=rng.uniform(0, 1, n).astype(np.float32),
        )
        p = tmp_path / "mat.ply"
        write_ply(p, v)
        back = read_ply(p)["vertex"]
        assert back.dtype == MATERIAL_PLY_DTYPE
        for name in v.dtype.names:
            np.testing.assert_array_equal(back[name], v[name])

    def test_load_material_ply(self, tmp_path, rng):
        n = 10
        v = make_material_vertex(
            coords=np.arange(30, dtype=np.float32).reshape(n, 3),
            density=np.full(n, 300.0, np.float32),
            E=np.full(n, 1e5, np.float32),
            nu=np.full(n, 0.3, np.float32),
            material_id=np.full(n, 2),
        )
        p = tmp_path / "m.ply"
        write_ply(p, v)
        params = load_material_ply(p)
        assert params["pos"].shape == (n, 3)
        assert (params["material_id"] == 2).all()
        assert (params["part_labels"] == 0).all()
        assert params["conf"].shape == (n,)

    def test_ascii_roundtrip(self, tmp_path):
        v = np.zeros(3, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
        v["x"] = [1, 2, 3]
        p = tmp_path / "a.ply"
        write_ply(p, v, text=True)
        back = read_ply(p)["vertex"]
        np.testing.assert_array_equal(back["x"], v["x"])


class TestMetrics:
    def test_masked_mean_matches_reference_semantics(self):
        import jax.numpy as jnp

        x = jnp.arange(8.0).reshape(1, 1, 2, 2, 2)
        mask = jnp.array([[[[[1.0, 0], [0, 0]], [[0, 0], [0, 1.0]]]]])
        out = masked_mean(x, mask, (2, 3, 4))
        np.testing.assert_allclose(np.asarray(out), [[3.5]], rtol=1e-5)

    def test_masked_mean_empty_mask_no_nan(self):
        import jax.numpy as jnp

        x = jnp.ones((1, 1, 2, 2, 2))
        out = masked_mean(x, jnp.zeros((1, 1, 2, 2, 2)), (2, 3, 4))
        assert np.isfinite(np.asarray(out)).all()

    def test_accuracy_ignore_index(self):
        import jax.numpy as jnp

        logits = jnp.zeros((1, 3, 2, 2, 2)).at[:, 1].set(1.0)  # predict class 1
        target = jnp.ones((1, 2, 2, 2), jnp.int32)
        target = target.at[0, 0, 0, 0].set(2)  # one wrong, ignored below
        acc = compute_accuracy(logits, target, mask=None, ignore_index=2)
        np.testing.assert_allclose(float(acc), 1.0)
