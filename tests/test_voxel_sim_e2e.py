"""End-to-end slice tests: voxelize -> map predictions -> simulate."""

import json
from pathlib import Path

import numpy as np
import pytest

from pixie_tpu.utils.norm import REFERENCE_RANGES


class SphereField:
    """Synthetic feature field: a dense sphere of radius 0.3 at the origin."""

    def __init__(self, feat_dim=16):
        self.feat_dim = feat_dim

    def query(self, points):
        points = np.asarray(points)
        r = np.linalg.norm(points, axis=-1)
        density = np.where(r < 0.3, 500.0, 0.0)[:, None]
        feature = np.tile(density > 0, (1, self.feat_dim)).astype(np.float32)
        return {"density": density, "feature": feature}

    def get_rgb(self, points):
        points = np.asarray(points)
        r = np.linalg.norm(points, axis=-1)
        return np.where(r[:, None] < 0.3, 0.8, 0.0).repeat(3, axis=-1)


class TestVoxelizer:
    def test_extract_and_mask(self, tmp_path):
        from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

        out = tmp_path / "clip_features.npz"
        paths = extract_feature_voxel_grid(
            SphereField(), out, voxel_size=1.0 / 32, expected_grid=32,
            batch_size=2048, nb_neighbors=10,
        )
        # async drain is the default since r5; join before reading the npy
        assert "wait" in paths
        paths["wait"]()
        feats = np.load(paths["features"])
        assert feats.shape == (32, 32, 32, 16)
        assert feats.dtype == np.float16
        mask = np.load(paths["mask"])
        assert mask.shape == (32, 32, 32)
        # sphere volume fraction ~ (4/3 pi 0.3^3) = 0.113 of the unit cube
        frac = mask.sum() / mask.size
        assert 0.05 < frac < 0.2
        meta = np.load(paths["npz"])
        assert tuple(meta["grid_shape"]) == (32, 32, 32)
        assert Path(paths["pc_ply"]).exists()

    @pytest.mark.parametrize("seed,density", [(0, 0.02), (1, 0.08), (2, 0.3)])
    def test_lattice_dbscan_matches_sklearn(self, seed, density):
        """lattice_nonnoise_mask is exactly sklearn DBSCAN's labels != -1
        for lattice points (the only way create_occupancy_mask calls it)."""
        from pixie_tpu.voxel.voxelize import (largest_clusters_mask,
                                              lattice_nonnoise_mask)

        rng = np.random.default_rng(seed)
        shape = (48, 48, 48)
        h = 1.0 / 64
        occ = rng.random(shape) < density
        # add an isolated small blob that should be DBSCAN noise
        occ[2, 2, 2] = True
        ijk = np.argwhere(occ)
        pts = (ijk.astype(np.float32) * h - 0.5).astype(np.float32)
        for eps_mult, min_pts in [(5.0, 10), (2.0, 5), (3.0, 27)]:
            ref = largest_clusters_mask(pts, eps=h * eps_mult,
                                        min_points=min_pts)
            got = lattice_nonnoise_mask(ijk, shape, r_lattice=eps_mult,
                                        min_points=min_pts)
            np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("seed,density", [(0, 0.02), (1, 0.3)])
    def test_lattice_device_matches_host(self, seed, density):
        """The jitted conv morphology (device lattice DBSCAN) is bit-equal
        to the host FFT version, hence to sklearn DBSCAN."""
        from pixie_tpu.voxel.voxelize import (lattice_nonnoise_mask,
                                              lattice_nonnoise_mask_device)

        rng = np.random.default_rng(seed)
        shape = (48, 48, 48)
        occ = rng.random(shape) < density
        occ[2, 2, 2] = True  # isolated noise blob
        ijk = np.argwhere(occ)
        for eps_mult, min_pts in [(5.0, 10), (2.0, 5)]:
            host = lattice_nonnoise_mask(ijk, shape, r_lattice=eps_mult,
                                         min_points=min_pts)
            dev = lattice_nonnoise_mask_device(ijk, shape,
                                               r_lattice=eps_mult,
                                               min_points=min_pts)
            np.testing.assert_array_equal(dev, host)
        assert lattice_nonnoise_mask_device(
            np.zeros((0, 3), np.int64), shape, 5.0).shape == (0,)

    def test_drain_failure_raises_from_wait(self, tmp_path, monkeypatch):
        """A failed background feature drain must surface from wait() and
        must not leave a partial *_features.npy visible (ADVICE r4)."""
        import pixie_tpu.voxel.voxelize as vox
        from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

        real_replace = vox.os.replace

        def boom(src, dst):
            if dst.endswith("_features.npy"):
                raise OSError("disk full (injected)")
            return real_replace(src, dst)

        monkeypatch.setattr(vox.os, "replace", boom)
        paths = extract_feature_voxel_grid(
            SphereField(), tmp_path / "clip_features.npz",
            voxel_size=1.0 / 32, expected_grid=32, batch_size=2048,
            nb_neighbors=10, async_fetch=True,
        )
        with pytest.raises(RuntimeError, match="drain failed"):
            paths["wait"]()
        assert not Path(paths["features"]).exists()

    @pytest.mark.parametrize("seed,density", [(0, 0.03), (1, 0.15)])
    def test_lattice_knn_matches_brute(self, seed, density):
        """Shell-count lattice kNN means == brute-force kNN means (exact
        open3d semantics), including the sparse-point brute fallback."""
        from pixie_tpu.sim.material_field import knn_mean_dist
        from pixie_tpu.voxel.voxelize import lattice_knn_mean_dist

        rng = np.random.default_rng(seed)
        shape = (40, 40, 40)
        h = 1.0 / 64
        occ = rng.random(shape) < density
        occ[1, 1, 1] = True   # isolated point -> exercises the fallback
        occ[2:5, 1, 1] = False
        ijk = np.argwhere(occ)
        pts = ijk.astype(np.float32) * h
        k = 10
        brute = knn_mean_dist(pts, pts, k=k, skip_self=True)
        lat = lattice_knn_mean_dist(ijk, shape, h, k=k, r_max=4)
        np.testing.assert_allclose(lat, brute, rtol=2e-6, atol=2e-7)

    def test_knn_mean_dist_matches_knn(self):
        from pixie_tpu.sim.material_field import knn, knn_mean_dist

        rng = np.random.default_rng(3)
        pts = rng.uniform(-0.5, 0.5, (700, 3)).astype(np.float32)
        d, _ = knn(pts, pts, k=11)
        ref = d[:, 1:].mean(axis=1)
        got = knn_mean_dist(pts, pts, k=10, skip_self=True)
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-7)
        # and the no-self variant against distinct query/ref sets
        q = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        d2, _ = knn(q, pts, k=7)
        np.testing.assert_allclose(
            knn_mean_dist(q, pts, k=7), d2.mean(axis=1), rtol=2e-6, atol=2e-7)

    def test_async_fetch_matches_sync(self, tmp_path):
        """async_fetch drains the feature npy on a background thread and
        hands back a device buffer; both must carry byte-identical values
        vs the synchronous path (pipeline.py fast-path contract)."""
        from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

        kw = dict(voxel_size=1.0 / 32, expected_grid=32, batch_size=2048,
                  nb_neighbors=10)
        sync = extract_feature_voxel_grid(
            SphereField(), tmp_path / "sync.npz", async_fetch=False, **kw)
        a = extract_feature_voxel_grid(
            SphereField(), tmp_path / "async.npz", async_fetch=True, **kw)
        assert "wait" in a and "features_dev" in a
        dev = np.asarray(a["features_dev"])
        t = a["wait"]()
        assert "fetch_bg_s" in t and "save_feat_s" in t
        a["wait"]()  # idempotent join
        f_sync = np.load(sync["features"])
        f_async = np.load(a["features"])
        np.testing.assert_array_equal(f_sync, f_async)
        np.testing.assert_array_equal(dev, f_async)
        assert f_async.dtype == np.float16
        np.testing.assert_array_equal(
            np.load(sync["mask"]), np.load(a["mask"]))
        np.testing.assert_array_equal(
            np.load(sync["alphas"]), np.load(a["alphas"]))

    def test_grid_shape_assert(self, tmp_path):
        from pixie_tpu.voxel.voxelize import extract_feature_voxel_grid

        with pytest.raises(AssertionError, match="voxel grid shape"):
            extract_feature_voxel_grid(
                SphereField(), tmp_path / "x.npz", voxel_size=1.0 / 16,
                expected_grid=64,
            )

    def test_alpha_weighting(self):
        from pixie_tpu.voxel.voxelize import get_alpha

        a = get_alpha(np.array([500.0]), 1.0 / 64)
        assert 0.99 < a[0] <= 1.0
        assert get_alpha(np.array([0.0]), 1.0 / 64)[0] == 0.0


class TestMapPredToPly:
    def test_map_and_world_transform(self, tmp_path):
        from pixie_tpu.voxel.map_pred_to_coords import map_pred_to_ply
        from pixie_tpu.utils.io import read_ply

        d = 16
        rng = np.random.default_rng(0)
        pred = rng.uniform(-1, 1, (11, d, d, d)).astype(np.float32)
        # make one-hot-ish seg channels
        seg = np.zeros((8, d, d, d), np.float32)
        cls = rng.integers(0, 8, (d, d, d))
        for k in range(8):
            seg[k] = cls == k
        pred[3:] = seg
        mask = (rng.uniform(size=(d, d, d)) < 0.3).astype(np.float32)

        np.save(tmp_path / "pred.npy", pred)
        np.save(tmp_path / "mask.npy", mask)
        np.savez(
            tmp_path / "grid.npz",
            min_bounds=np.array([-0.5, -0.5, -0.5], np.float32),
            max_bounds=np.array([0.5, 0.5, 0.5], np.float32),
            grid_shape=np.array([d, d, d]),
        )
        dp = {"scale": 2.0, "transform": np.eye(4)[:3].tolist()}
        (tmp_path / "dataparser_transforms.json").write_text(json.dumps(dp))

        vertex = map_pred_to_ply(
            tmp_path / "pred.npy", tmp_path / "mask.npy", tmp_path / "grid.npz",
            tmp_path / "mapped_preds.ply", "obj", REFERENCE_RANGES,
            world_output_path=tmp_path / "world.ply",
            dataparser_path=tmp_path / "dataparser_transforms.json",
        )
        assert len(vertex) == int(mask.sum())
        # density must be in physical range (unscaled)
        assert vertex["density"].min() >= 10 ** REFERENCE_RANGES.density_min - 1
        assert vertex["density"].max() <= 10 ** REFERENCE_RANGES.density_max + 1
        # conf is the max class probability = 1.0 for one-hot
        np.testing.assert_allclose(vertex["conf"], 1.0)
        # world output scaled by 1/2
        w = read_ply(tmp_path / "world.ply")["vertex"]
        np.testing.assert_allclose(w["x"], vertex["x"] / 2.0, atol=1e-6)

    def test_shape_mismatch_raises(self, tmp_path):
        from pixie_tpu.voxel.map_pred_to_coords import map_pred_to_ply

        np.save(tmp_path / "pred.npy", np.zeros((11, 8, 8, 8), np.float32))
        np.save(tmp_path / "mask.npy", np.zeros((16, 16, 16), np.float32))
        np.savez(
            tmp_path / "grid.npz",
            min_bounds=np.zeros(3), max_bounds=np.ones(3),
            grid_shape=np.array([16, 16, 16]),
        )
        with pytest.raises(ValueError, match="do not match grid shape"):
            map_pred_to_ply(
                tmp_path / "pred.npy", tmp_path / "mask.npy",
                tmp_path / "grid.npz", tmp_path / "out.ply", "obj",
                REFERENCE_RANGES,
            )


class TestSimDriver:
    def test_full_rollout_from_material_ply(self, tmp_path):
        from pixie_tpu.sim.driver import run_simulation
        from pixie_tpu.utils.io import make_material_vertex, write_ply, read_ply

        rng = np.random.default_rng(0)
        n = 400
        coords = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        v = make_material_vertex(
            coords=coords,
            density=np.full(n, 300.0, np.float32),
            E=np.full(n, 1e5, np.float32),
            nu=np.full(n, 0.35, np.float32),
            material_id=np.zeros(n, np.int64),
        )
        ply = tmp_path / "mapped_preds.ply"
        write_ply(ply, v)

        sim_cfg = {
            "material": "jelly", "n_grid": 24, "grid_lim": 2.0,
            "substep_dt": 1e-4, "frame_dt": 2e-3, "frame_num": 3,
            "g": 9.8,
            "boundary_conditions": [
                {"type": "surface_collider", "point": [0, 0, 0.1],
                 "normal": [0, 0, 1], "surface": "sticky", "friction": 0.0,
                 "start_time": 0, "end_time": 1e3}
            ],
        }
        cfg_path = tmp_path / "sim.json"
        cfg_path.write_text(json.dumps(sim_cfg))

        info = run_simulation(ply, cfg_path, tmp_path / "out", debug=True)
        assert info["n_particles"] == n
        assert info["frames"] == 3
        assert info["substeps_per_frame"] == 20
        frames = sorted((tmp_path / "out" / "ply_files").glob("frame_*.ply"))
        assert len(frames) == 3
        f = read_ply(frames[-1])["vertex"]
        assert len(f) == n
        assert np.isfinite(f["x"]).all()
        # world-frame output should be near the original object scale
        assert np.abs(f["x"]).max() < 1.0
        assert (tmp_path / "out" / "sim_info.json").exists()
        assert (tmp_path / "out" / "boundary_conditions.json").exists()


class TestGaussianCheckpointSim:
    def test_sim_from_gs_checkpoint_with_knn_material(self, tmp_path):
        """The reference's full flow: 3DGS particles + kNN-mapped material PLY."""
        import json

        from pixie_tpu.recon import gaussians as G
        from pixie_tpu.sim.driver import run_simulation
        from pixie_tpu.utils.io import make_material_vertex, write_ply

        rng = np.random.default_rng(0)
        # gaussians: a blob of 500
        pts = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
        params = G.create_from_points(pts, initial_opacity=0.8)
        ckpt = tmp_path / "gs" / "point_cloud" / "iteration_100"
        ckpt.mkdir(parents=True)
        G.save_gaussian_ply(ckpt / "point_cloud.ply", params)

        # material PLY on a DIFFERENT, sparser set -> kNN smoothing must map
        mpts = rng.uniform(-0.2, 0.2, (120, 3)).astype(np.float32)
        v = make_material_vertex(
            coords=mpts,
            density=np.full(120, 300.0, np.float32),
            E=np.full(120, 1e5, np.float32),
            nu=np.full(120, 0.35, np.float32),
            material_id=np.zeros(120, np.int64),
        )
        write_ply(tmp_path / "mapped_preds.ply", v)

        cfg = {
            "material": "jelly", "n_grid": 24, "grid_lim": 2.0,
            "substep_dt": 1e-4, "frame_dt": 1e-3, "frame_num": 2, "g": 9.8,
        }
        (tmp_path / "sim.json").write_text(json.dumps(cfg))
        info = run_simulation(
            tmp_path / "mapped_preds.ply", tmp_path / "sim.json",
            tmp_path / "out", gaussian_checkpoint=tmp_path / "gs",
        )
        assert info["n_particles"] == 500  # gaussians, not PLY vertices
        from pixie_tpu.utils.io import read_ply

        f = read_ply(sorted((tmp_path / "out" / "ply_files").glob("*.ply"))[-1])["vertex"]
        assert len(f) == 500
        # material mapped from the PLY via kNN
        np.testing.assert_allclose(f["E"], 1e5, rtol=1e-4)
        assert np.isfinite(f["x"]).all()


class TestRolloutCheckpoint:
    def test_checkpoint_resume_matches_uninterrupted(self, tmp_path):
        """4-frame rollout == 2 frames + checkpoint + resumed 2 frames
        (bit-exact: the snapshot carries the FULL MPMState).  The reference
        cannot do this (engine_utils.py exports positions only)."""
        import json

        from pixie_tpu.sim.driver import run_simulation
        from pixie_tpu.utils.io import make_material_vertex, read_ply, write_ply

        rng = np.random.default_rng(3)
        n = 300
        coords = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        v = make_material_vertex(
            coords=coords,
            density=np.full(n, 300.0, np.float32),
            E=np.full(n, 1e5, np.float32),
            nu=np.full(n, 0.35, np.float32),
            material_id=np.zeros(n, np.int64),
        )
        ply = tmp_path / "mapped_preds.ply"
        write_ply(ply, v)
        sim_cfg = {
            "material": "jelly", "n_grid": 24, "grid_lim": 2.0,
            "substep_dt": 1e-4, "frame_dt": 1e-3, "frame_num": 4, "g": 9.8,
            "boundary_conditions": [
                {"type": "surface_collider", "point": [0, 0, 0.1],
                 "normal": [0, 0, 1], "surface": "sticky", "friction": 0.0,
                 "start_time": 0, "end_time": 1e3}
            ],
        }
        cfg_path = tmp_path / "sim.json"
        cfg_path.write_text(json.dumps(sim_cfg))

        run_simulation(ply, cfg_path, tmp_path / "ref")
        ref = read_ply(sorted(
            (tmp_path / "ref" / "ply_files").glob("frame_*.ply"))[-1])["vertex"]

        # interrupted: 2 frames with a checkpoint, then resume to the end
        run_simulation(ply, cfg_path, tmp_path / "ck", n_frames=2,
                       checkpoint_every=2)
        assert (tmp_path / "ck" / "rollout_ckpt.npz").exists()
        info = run_simulation(ply, cfg_path, tmp_path / "ck", resume=True,
                              checkpoint_every=2)
        assert info["frames"] == 4
        got = read_ply(sorted(
            (tmp_path / "ck" / "ply_files").glob("frame_*.ply"))[-1])["vertex"]
        for fld in ("x", "y", "z"):
            np.testing.assert_array_equal(got[fld], ref[fld])
