"""GS-rendered simulation output (gs_simulation.py:573-631 rebuild)."""

import json

import numpy as np
import pytest


def _quat_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class TestCovDecomposition:
    def test_roundtrip(self):
        """cov -> (log scales, quat) -> cov must be identity."""
        from pixie_tpu.sim.render_sim import cov6_to_log_scales_quats

        rng = np.random.default_rng(0)
        # random SPD covariances with distinct eigenvalues
        a = rng.normal(size=(64, 3, 3))
        cov = a @ np.transpose(a, (0, 2, 1)) + np.eye(3) * 1e-4
        cov6 = np.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)
        log_s, quat = cov6_to_log_scales_quats(cov6)
        s2 = np.exp(log_s) ** 2
        for i in range(64):
            r = _quat_to_rot(quat[i])
            rec = r @ np.diag(s2[i]) @ r.T
            # float32 quat/scale storage bounds the reconstruction
            np.testing.assert_allclose(rec, cov[i], rtol=1e-4, atol=1e-5)
        # descending scales, unit quats
        assert np.all(np.diff(log_s, axis=1) <= 1e-9)
        np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0,
                                   atol=1e-6)

    def test_isotropic_and_degenerate(self):
        from pixie_tpu.sim.render_sim import cov6_to_log_scales_quats

        cov6 = np.array([
            [0.04, 0, 0, 0.04, 0, 0.04],       # isotropic
            [1e-10, 0, 0, 1e-10, 0, 1e-10],    # near-zero
        ])
        log_s, quat = cov6_to_log_scales_quats(cov6)
        assert np.isfinite(log_s).all() and np.isfinite(quat).all()
        np.testing.assert_allclose(np.exp(log_s[0]), 0.2, rtol=1e-5)


class TestSimRenderLoop:
    @pytest.fixture()
    def gs_scene(self, tmp_path):
        from pixie_tpu.recon import gaussians as G
        from pixie_tpu.utils.io import make_material_vertex, write_ply

        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.2, 0.2, (300, 3)).astype(np.float32)
        params = G.create_from_points(
            pts, colors=rng.uniform(0.2, 0.9, (300, 3)).astype(np.float32),
            initial_opacity=0.9,
        )
        ckpt = tmp_path / "gs" / "point_cloud" / "iteration_50"
        ckpt.mkdir(parents=True)
        G.save_gaussian_ply(ckpt / "point_cloud.ply", params)

        v = make_material_vertex(
            coords=pts,
            density=np.full(300, 400.0, np.float32),
            E=np.full(300, 2e5, np.float32),
            nu=np.full(300, 0.3, np.float32),
            material_id=np.zeros(300, np.int64),
        )
        write_ply(tmp_path / "mapped_preds.ply", v)

        cfg = {
            "material": "jelly", "n_grid": 24, "grid_lim": 2.0,
            "substep_dt": 1e-4, "frame_dt": 1e-3, "frame_num": 3, "g": 9.8,
            "mpm_space_viewpoint_center": [1.0, 1.0, 1.0],
            "mpm_space_vertical_upward_axis": [0, 0, 1],
            "default_camera_index": -1,
            "init_azimuthm": 30.0, "init_elevation": 20.0, "init_radius": 1.5,
        }
        (tmp_path / "sim.json").write_text(json.dumps(cfg))
        return tmp_path

    def test_rendered_rollout(self, gs_scene):
        """Full loop: frames are non-trivial PNGs + gaussian-format PLYs
        that reload through the standard loader."""
        from PIL import Image

        from pixie_tpu.recon.gaussians import load_gaussian_ply
        from pixie_tpu.sim.driver import run_simulation

        info = run_simulation(
            gs_scene / "mapped_preds.ply", gs_scene / "sim.json",
            gs_scene / "out", gaussian_checkpoint=gs_scene / "gs",
            render_img=True, save_ply=True,
        )
        assert info["median_render_ms"] is not None

        frames = sorted((gs_scene / "out" / "frames").glob("*.png"))
        assert len(frames) == 3
        img = np.asarray(Image.open(frames[0]))
        assert img.shape[2] == 3 and img.shape[0] % 1 == 0
        # splats must actually appear against the black background
        assert img.mean() > 1.0, "rendered frame is empty"

        plys = sorted((gs_scene / "out" / "ply_files").glob("*.ply"))
        assert len(plys) == 3
        gs = load_gaussian_ply(plys[-1])
        assert gs["xyz"].shape == (300, 3)
        assert np.isfinite(np.asarray(gs["scaling"])).all()
        assert np.isfinite(np.asarray(gs["rotation"])).all()

    def test_frames_change_over_time(self, gs_scene):
        """Gravity moves the splats: consecutive frames must differ."""
        from PIL import Image

        from pixie_tpu.sim.driver import run_simulation

        cfg = json.loads((gs_scene / "sim.json").read_text())
        cfg["frame_dt"] = 2e-2  # 200 substeps -> visible motion
        cfg["frame_num"] = 2
        (gs_scene / "sim2.json").write_text(json.dumps(cfg))
        run_simulation(
            gs_scene / "mapped_preds.ply", gs_scene / "sim2.json",
            gs_scene / "out2", gaussian_checkpoint=gs_scene / "gs",
            render_img=True, save_ply=False,
        )
        frames = sorted((gs_scene / "out2" / "frames").glob("*.png"))
        a = np.asarray(Image.open(frames[0]), np.float32)
        b = np.asarray(Image.open(frames[1]), np.float32)
        assert np.abs(a - b).mean() > 0.01, "simulation did not move the render"
