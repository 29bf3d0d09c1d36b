"""Reconstruction stack tests: hash encoding, fields, rendering, training."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.recon.field import FeatureField, NerfField, RenderConfig, render_rays
from pixie_tpu.recon.hashgrid import (
    HashGridConfig,
    HashGridEncoding,
    frequency_encoding,
    sh_encoding,
)


class TestHashGrid:
    def test_shapes_and_determinism(self, rng):
        cfg = HashGridConfig(n_levels=4, features_per_level=2,
                             log2_table_size=12, base_resolution=4,
                             max_resolution=32)
        enc = HashGridEncoding(cfg)
        x = jnp.asarray(rng.uniform(0, 1, (100, 3)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (100, 8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(enc.apply(params, x)))

    def test_trilinear_continuity(self, rng):
        """Output must be continuous: nearby points give nearby features."""
        cfg = HashGridConfig(n_levels=2, features_per_level=2,
                             log2_table_size=10, base_resolution=4,
                             max_resolution=8)
        enc = HashGridEncoding(cfg)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (50, 3)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        a = enc.apply(params, x)
        b = enc.apply(params, x + 1e-4)
        assert float(jnp.abs(a - b).max()) < 1e-2

    def test_gradients_flow_to_table(self, rng):
        enc = HashGridEncoding(HashGridConfig(n_levels=2, features_per_level=2,
                                              log2_table_size=8,
                                              base_resolution=4, max_resolution=8))
        x = jnp.asarray(rng.uniform(0, 1, (16, 3)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
        assert float(jnp.abs(g["params"]["table"]).sum()) > 0

    def test_frequency_and_sh_encodings(self):
        x = jnp.array([[0.1, 0.2, 0.3]])
        assert frequency_encoding(x, 6).shape == (1, 36)
        d = jnp.array([[0.0, 0.0, 1.0]])
        sh = sh_encoding(d, 4)
        assert sh.shape == (1, 16)
        np.testing.assert_allclose(float(sh[0, 0]), 0.2820947917, rtol=1e-6)


class TestRendering:
    def _setup(self):
        nerf = NerfField()
        rng = jax.random.PRNGKey(0)
        p = nerf.init(rng, jnp.zeros((4, 3)), jnp.zeros((4, 3)), False)
        apply = lambda pp, pts, dirs, donly: nerf.apply(pp, pts, dirs, donly)
        return apply, p

    def test_render_outputs_shapes(self):
        apply, p = self._setup()
        origins = jnp.zeros((8, 3)).at[:, 2].set(2.0)
        dirs = jnp.zeros((8, 3)).at[:, 2].set(-1.0)
        cfg = RenderConfig(n_coarse=16, n_fine=16)
        out = render_rays(apply, None, p, None, origins, dirs,
                          jax.random.PRNGKey(1), cfg, train=False,
                          with_features=False)
        assert out["rgb"].shape == (8, 3)
        assert out["accumulation"].shape == (8,)
        assert float(out["accumulation"].min()) >= 0
        assert float(out["accumulation"].max()) <= 1 + 1e-5
        assert np.isfinite(np.asarray(out["rgb"])).all()

    def test_feature_rendering(self):
        apply, p = self._setup()
        feat = FeatureField(feature_dim=8)
        fp = feat.init(jax.random.PRNGKey(2), jnp.zeros((4, 3)))
        fapply = lambda pp, pts: feat.apply(pp, pts)
        origins = jnp.zeros((4, 3)).at[:, 2].set(2.0)
        dirs = jnp.zeros((4, 3)).at[:, 2].set(-1.0)
        out = render_rays(apply, fapply, p, fp, origins, dirs,
                          jax.random.PRNGKey(1), RenderConfig(16, 16),
                          train=True, with_features=True)
        assert out["feature"].shape == (4, 8)


class TestProposalSampling:
    def _setup(self):
        from pixie_tpu.recon.field import ProposalField

        nerf = NerfField()
        prop = ProposalField()
        rng = jax.random.PRNGKey(0)
        pn = nerf.init(rng, jnp.zeros((4, 3)), jnp.zeros((4, 3)), False)
        pp = prop.init(jax.random.fold_in(rng, 1), jnp.zeros((4, 3)))
        napply = lambda p, pts, dirs, donly: nerf.apply(p, pts, dirs, donly)
        papply = lambda p, pts: prop.apply(p, pts)
        return napply, papply, pn, pp

    def test_render_prop_shapes(self):
        from pixie_tpu.recon.field import render_rays_prop

        napply, papply, pn, pp = self._setup()
        origins = jnp.zeros((8, 3)).at[:, 2].set(2.0)
        dirs = jnp.zeros((8, 3)).at[:, 2].set(-1.0)
        cfg = RenderConfig(n_coarse=32, n_fine=16)
        out = render_rays_prop(papply, napply, None, pp, pn, None,
                               origins, dirs, jax.random.PRNGKey(1), cfg,
                               train=False, with_features=False)
        assert out["rgb"].shape == (8, 3)
        assert out["weights"].shape == (8, 16)
        assert np.isfinite(float(out["prop_loss"]))
        assert float(out["prop_loss"]) >= 0

    def test_proposal_loss_direction(self):
        """Proposal mass covering the final distribution -> ~zero loss;
        proposal mass elsewhere -> positive loss."""
        from pixie_tpu.recon.field import proposal_loss

        t_prop = jnp.linspace(0.0, 1.0, 9)[None]    # 8 bins
        t_fine = jnp.array([[0.50, 0.55, 0.60, 0.65, 0.70]])  # 4 bins
        w_fine = jnp.array([[0.25, 0.25, 0.25, 0.25]])
        covering = jnp.zeros((1, 8)).at[0, 4:6].set(0.5)   # bins [0.5, 0.75]
        missing = jnp.zeros((1, 8)).at[0, 0:2].set(0.5)    # bins [0, 0.25]
        lo = float(proposal_loss(t_prop, covering, t_fine, w_fine))
        hi = float(proposal_loss(t_prop, missing, t_fine, w_fine))
        assert lo < 1e-6
        assert hi > 0.01

    def test_sampling_is_detached(self, monkeypatch):
        """mip-NeRF 360 semantics behind PIXIE_DETACH_SAMPLES=1: the
        proposal field gets gradient ONLY through the interlevel loss —
        an rgb-only loss must produce exactly zero proposal-parameter
        gradient.  The DEFAULT keeps sample positions differentiable
        (r5e TPU A/B: the stop_gradient broke an XLA bwd fusion, +47 ms,
        docs/tpu_logs/r5e_queue.log), so the default path must leak —
        both behaviors are pinned here."""
        from pixie_tpu.recon.field import render_rays_prop

        napply, papply, pn, pp = self._setup()
        origins = jnp.zeros((8, 3)).at[:, 2].set(2.0)
        dirs = jnp.zeros((8, 3)).at[:, 2].set(-1.0)
        cfg = RenderConfig(n_coarse=16, n_fine=8)

        def rgb_loss(pp_):
            out = render_rays_prop(papply, napply, None, pp_, pn, None,
                                   origins, dirs, jax.random.PRNGKey(1),
                                   cfg, train=True, with_features=False)
            return jnp.mean(out["rgb"] ** 2)

        monkeypatch.setenv("PIXIE_DETACH_SAMPLES", "1")
        g = jax.grad(rgb_loss)(pp)
        assert all(float(jnp.abs(x).max()) == 0.0
                   for x in jax.tree.leaves(g)), \
            "rgb loss leaked gradient into the proposal field"

        monkeypatch.setenv("PIXIE_DETACH_SAMPLES", "0")
        g_default = jax.grad(rgb_loss)(pp)
        assert any(float(jnp.abs(x).max()) > 0.0
                   for x in jax.tree.leaves(g_default)), \
            "default (no-detach) path should differentiate through samples"

        # the interlevel loss path must still carry gradient: force an
        # under-covering proposal (all fine mass in one narrow interval)
        from pixie_tpu.recon.field import _weights_from_sigma, proposal_loss

        t_edges = jnp.broadcast_to(
            jnp.linspace(cfg.near, cfg.far, cfg.n_coarse + 1),
            (8, cfg.n_coarse + 1))
        mids = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
        pts_p = origins[:, None, :] + mids[..., None] * dirs[:, None, :]
        t_fine = jnp.broadcast_to(
            jnp.array([1.0, 1.001, 1.002]), (8, 3))
        w_fine = jnp.broadcast_to(jnp.array([0.5, 0.5]), (8, 2))

        def il_loss(pp_):
            sigma_p = papply(pp_, pts_p * 0.5 + 0.5)[..., 0]
            w_p = _weights_from_sigma(sigma_p, t_edges)
            return proposal_loss(t_edges, w_p, t_fine, w_fine)

        g2 = jax.grad(il_loss)(pp)
        assert any(float(jnp.abs(x).max()) > 0.0
                   for x in jax.tree.leaves(g2)), \
            "interlevel loss must still train the proposal field"

    def test_onehot_feature_targets_match_gather(self):
        """make_ray_fn's one-hot MXU row-select returns bit-identical
        feature targets to the direct (n,768) gather it replaced."""
        from pixie_tpu.recon.train_field import make_ray_fn

        rng = np.random.default_rng(5)
        n_img, h, w, hf, wf, c = 3, 32, 32, 4, 4, 24
        ds = {
            "images": rng.random((n_img, h, w, 3)).astype(np.float32),
            "c2w": np.broadcast_to(np.eye(4, dtype=np.float32),
                                   (n_img, 4, 4)).copy(),
            "intrinsics": (20.0, 20.0, 16.0, 16.0),
        }
        fm = rng.standard_normal((n_img, hf, wf, c)).astype(np.float32)
        sample = make_ray_fn(ds, fm)
        key = jax.random.PRNGKey(7)
        o, d, rgb, feat = sample(key, 64)
        # reference: recompute the indices and gather directly
        k1, k2, k3 = jax.random.split(key, 3)
        img_idx = np.asarray(jax.random.randint(k1, (64,), 0, n_img))
        px = np.asarray(jax.random.randint(k2, (64,), 0, w))
        py = np.asarray(jax.random.randint(k3, (64,), 0, h))
        fy_i = np.clip((py * hf) // h, 0, hf - 1)
        fx_i = np.clip((px * wf) // w, 0, wf - 1)
        np.testing.assert_array_equal(np.asarray(feat),
                                      fm[img_idx, fy_i, fx_i])

    def test_dense_bisect_matches_numpy_searchsorted(self):
        """The compare-count bisections (TPU replacement for the serial
        searchsorted lowering) match numpy exactly, including ties."""
        from pixie_tpu.recon.field import _searchsorted_right

        rng = np.random.default_rng(3)
        # quantized values guarantee exact ties between ref and queries
        ref = np.sort(rng.integers(0, 8, (6, 11)).astype(np.float32) / 8.0,
                      axis=-1)
        q = rng.integers(0, 8, (6, 9)).astype(np.float32) / 8.0
        want_r = np.stack([np.searchsorted(r, qq, side="right")
                           for r, qq in zip(ref, q)])
        got_r = np.asarray(_searchsorted_right(jnp.asarray(ref),
                                               jnp.asarray(q)))
        np.testing.assert_array_equal(got_r, want_r)
        want_l = np.stack([np.searchsorted(r, qq, side="left")
                           for r, qq in zip(ref, q)])
        got_l = np.asarray(jnp.sum(
            jnp.asarray(ref)[..., None, :] < jnp.asarray(q)[..., :, None],
            axis=-1))
        np.testing.assert_array_equal(got_l, want_l)

    def test_sample_pdf_concentrates(self):
        from pixie_tpu.recon.field import _sample_pdf

        t_edges = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17), (4, 17))
        w = jnp.zeros((4, 16)).at[:, 8].set(1.0)  # all mass in [0.5, 0.5625]
        t = _sample_pdf(t_edges, w, 8, jax.random.PRNGKey(0), train=False)
        tn = np.asarray(t)
        # nearly all samples inside the massive bin (eps spill allowed)
        assert ((tn >= 0.49) & (tn <= 0.58)).mean() > 0.9
        assert (np.diff(tn, axis=-1) >= 0).all()

    def test_pdf_dense_matches_gather(self, monkeypatch):
        """PIXIE_PDF_DENSE=1 (one-hot contraction gathers, r5g lever) is
        bit-identical to the take_along_axis path — values AND gradients —
        through _sample_pdf, _outer_measure, and the full prop render."""
        from pixie_tpu.recon.field import (_outer_measure, _sample_pdf,
                                           render_rays_prop)

        t_edges = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 17), (6, 17))
        w = jax.random.uniform(jax.random.PRNGKey(3), (6, 16))
        rng = jax.random.PRNGKey(9)

        def run_all():
            t = _sample_pdf(t_edges, w, 8, rng, train=True)
            tq = jnp.sort(
                jax.random.uniform(jax.random.PRNGKey(4), (6, 9)) * 2.0,
                axis=-1)
            om = _outer_measure(t_edges, w, tq)
            return t, om

        monkeypatch.setenv("PIXIE_PDF_DENSE", "0")
        t0, om0 = run_all()
        monkeypatch.setenv("PIXIE_PDF_DENSE", "1")
        t1, om1 = run_all()
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(om0), np.asarray(om1))

        napply, papply, pn, pp = self._setup()
        origins = jnp.zeros((8, 3)).at[:, 2].set(2.0)
        dirs = jnp.zeros((8, 3)).at[:, 2].set(-1.0)
        cfg = RenderConfig(n_coarse=16, n_fine=8)

        def loss(pn_):
            out = render_rays_prop(papply, napply, None, pp, pn_, None,
                                   origins, dirs, jax.random.PRNGKey(1),
                                   cfg, train=True, with_features=False)
            return jnp.mean(out["rgb"] ** 2) + out["prop_loss"]

        monkeypatch.setenv("PIXIE_PDF_DENSE", "0")
        l0, g0 = jax.value_and_grad(loss)(pn)
        monkeypatch.setenv("PIXIE_PDF_DENSE", "1")
        l1, g1 = jax.value_and_grad(loss)(pn)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pdf_stratified_sorted_and_concentrates(self, monkeypatch):
        """PIXIE_PDF_STRAT=1 draws one uniform per 1/n slot: output is
        sorted by construction (no jnp.sort), lands in the massive bin,
        and differs per ray (still random)."""
        from pixie_tpu.recon.field import _sample_pdf

        monkeypatch.setenv("PIXIE_PDF_STRAT", "1")
        t_edges = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 17), (4, 17))
        w = jnp.zeros((4, 16)).at[:, 8].set(1.0)
        t = _sample_pdf(t_edges, w, 8, jax.random.PRNGKey(0), train=True)
        tn = np.asarray(t)
        assert (np.diff(tn, axis=-1) >= 0).all()
        assert ((tn >= 0.49) & (tn <= 0.58)).mean() > 0.9
        assert not np.allclose(tn[0], tn[1])


def make_synthetic_blender_dataset(root: Path, n_views=6, res=24):
    """A red unit sphere at the origin rendered analytically."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    frames = []
    fov = 0.8
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        cam_pos = 2.0 * np.array([np.cos(theta), np.sin(theta), 0.4])
        fwd = -cam_pos / np.linalg.norm(cam_pos)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, cam_pos

        fx = 0.5 * res / np.tan(0.5 * fov)
        img = np.zeros((res, res, 3), np.float32)
        for py in range(res):
            for px in range(res):
                d = np.array([(px + 0.5 - res / 2) / fx,
                              -(py + 0.5 - res / 2) / fx, -1.0])
                d = c2w[:3, :3] @ d
                d /= np.linalg.norm(d)
                # ray-sphere intersection, radius 0.35
                b = 2 * np.dot(cam_pos, d)
                c = np.dot(cam_pos, cam_pos) - 0.35**2
                disc = b * b - 4 * c
                if disc > 0:
                    img[py, px] = [0.9, 0.1, 0.1]
        fname = f"r_{i}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(root / fname)
        frames.append({"file_path": fname, "transform_matrix": c2w.tolist()})
    (root / "transforms.json").write_text(
        json.dumps({"camera_angle_x": fov, "frames": frames})
    )
    return root


class TestFieldTraining:
    def test_short_training_reduces_loss(self, tmp_path):
        from pixie_tpu.recon.field import RenderConfig
        from pixie_tpu.recon.train_field import (
            FieldTrainConfig,
            load_field_checkpoint,
            train_feature_field,
        )

        data = make_synthetic_blender_dataset(tmp_path / "data")
        cfg = FieldTrainConfig(
            max_iterations=30, rays_per_batch=256,
            encoding="hashgrid",  # gather encoding is the fast path on CPU
            render=RenderConfig(n_coarse=16, n_fine=8),
        )
        import logging

        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        logging.getLogger().addHandler(Capture())
        params = train_feature_field(
            data, tmp_path / "out", cfg=cfg, log_every=29
        )
        assert (tmp_path / "out" / "checkpoints" / "field").exists()
        restored = load_field_checkpoint(tmp_path / "out")
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scan_chunk_loop_matches_per_step_loop(self, tmp_path, monkeypatch):
        """PIXIE_FIELD_SCAN=K (one lax.scan dispatch per K steps) must be a
        pure scheduling change: identical rng stream, identical lr schedule
        (optax count rides in opt_state), so final params match the
        per-step loop to float tolerance."""
        from pixie_tpu.recon.field import RenderConfig
        from pixie_tpu.recon.train_field import (
            FieldTrainConfig,
            train_feature_field,
        )

        data = make_synthetic_blender_dataset(tmp_path / "data")
        cfg = FieldTrainConfig(
            max_iterations=10, rays_per_batch=128,
            encoding="hashgrid",
            render=RenderConfig(n_coarse=8, n_fine=4),
            eval_views=0,
        )
        outs = {}
        for k in ("0", "4"):  # 4 does not divide 10: exercises the remainder
            monkeypatch.setenv("PIXIE_FIELD_SCAN", k)
            params = train_feature_field(
                data, tmp_path / f"out{k}", cfg=cfg, log_every=100
            )
            outs[k] = [np.asarray(p) for p in jax.tree.leaves(params)]
        for a, b in zip(outs["0"], outs["4"]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

    def test_field_adapter_query_contract(self, tmp_path):
        from pixie_tpu.recon.field_adapter import FieldAdapter

        nerf = NerfField()
        p = nerf.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3)), False)
        adapter = FieldAdapter(p, None, feature_dim=4)
        pts = np.random.default_rng(0).uniform(-0.5, 0.5, (10, 3)).astype(np.float32)
        out = adapter.query(pts)
        assert out["density"].shape == (10, 1)
        assert np.isfinite(np.asarray(out["density"])).all()
        rgb = adapter.get_rgb(pts)
        assert rgb.shape == (10, 3)
        alpha = adapter.get_alpha(pts, 1.0 / 64)
        assert float(jnp.max(alpha)) <= 1.0
