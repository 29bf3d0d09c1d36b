"""Packed one-dispatch voxel-grid query (voxelize.build_packed_grid_query).

The packed scan exists to collapse ~192 remote program dispatches into one
(docs/DESIGN.md r4e: 35-95 s of per-dispatch tax surfaced in
alphas_rgb_fetch_s).  These tests pin its contract: identical artifacts to
the per-batch fallback loop, through both the raw builder and the full
extract_feature_voxel_grid funnel (reference pixie/voxel/voxelize.py:17-141).
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def adapter():
    import jax

    from pixie_tpu.recon.field import FeatureField, NerfField
    from pixie_tpu.recon.field_adapter import FieldAdapter

    nerf = NerfField()
    feat = FeatureField(feature_dim=32)
    rng = jax.random.PRNGKey(3)
    dummy = jnp.zeros((8, 3))
    nerf_p = nerf.init(rng, dummy, jnp.zeros((8, 3)), False)
    feat_p = feat.init(jax.random.fold_in(rng, 7), dummy)
    return FieldAdapter(nerf_p, feat_p, feature_dim=32)


def test_builder_matches_per_batch_loop(adapter):
    """Raw builder output == the query()/get_rgb()/_pack_batch loop."""
    from pixie_tpu.voxel.voxelize import _pack_batch

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, size=(1000, 3)).astype(np.float32)
    chunk, delta = 256, np.float32(1 / 16)

    f_pk, ar_pk = adapter.query_packed_chunks(pts, chunk, delta)
    assert f_pk.shape == (1024, 32) and ar_pk.shape == (1024, 4)

    for i in range(0, 1000, chunk):
        batch = pts[i : i + chunk]
        bn = len(batch)
        if bn != chunk:
            batch = np.concatenate(
                [batch, np.zeros((chunk - bn, 3), np.float32)], axis=0)
        out = adapter.query(batch)
        f16, a16, r16 = _pack_batch(
            out["density"], out["feature"], adapter.get_rgb(batch),
            delta, True)
        np.testing.assert_array_equal(
            np.asarray(f_pk[i : i + chunk][:bn]), np.asarray(f16[:bn]))
        np.testing.assert_array_equal(
            np.asarray(ar_pk[i : i + chunk][:bn, :1]), np.asarray(a16[:bn]))
        np.testing.assert_array_equal(
            np.asarray(ar_pk[i : i + chunk][:bn, 1:]), np.asarray(r16[:bn]))


def test_extract_artifacts_match_fallback(adapter, tmp_path, monkeypatch):
    """extract_feature_voxel_grid writes byte-identical artifacts with the
    packed path on vs off (PIXIE_VOX_PACKED)."""
    from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

    bounds = [(-0.5, 0.5)] * 3
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("PIXIE_VOX_PACKED", flag)
        out = tmp_path / f"packed{flag}" / "grid.npz"
        paths = extract_feature_voxel_grid(
            adapter, out, bounds, voxel_size=1 / 16, batch_size=1024,
            alpha_threshold_for_mask=0.0, expected_grid=16,
        )
        outs[flag] = paths
        if "wait" in paths:  # async drain is the default since r5
            paths["wait"]()
        assert Path(paths["features"]).exists()

    for key in ("features", "alphas", "rgb", "mask"):
        a = np.load(outs["0"][key])
        b = np.load(outs["1"][key])
        np.testing.assert_array_equal(a, b, err_msg=key)
    assert outs["0"]["timings"]["sparse_rows"] == \
        outs["1"]["timings"]["sparse_rows"]


def test_packed_respects_async_fetch(adapter, tmp_path, monkeypatch):
    """Packed path + async drain: features_dev handoff matches the npy."""
    from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

    monkeypatch.setenv("PIXIE_VOX_PACKED", "1")
    out = tmp_path / "grid.npz"
    paths = extract_feature_voxel_grid(
        adapter, out, [(-0.5, 0.5)] * 3, voxel_size=1 / 16, batch_size=1024,
        alpha_threshold_for_mask=0.0, expected_grid=16, async_fetch=True,
    )
    assert "features_dev" in paths and "wait" in paths
    paths["wait"]()
    feats = np.load(paths["features"])
    np.testing.assert_array_equal(feats, np.asarray(paths["features_dev"]))
