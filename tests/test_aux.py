"""Aux subsystem tests: inspect_ranges, per-class metrics, viz, curation."""

import json
from pathlib import Path

import numpy as np
import pytest


class TestInspectRanges:
    def test_computes_ranges_and_flags_problematic(self, tmp_path, rng):
        from pixie_tpu.train.inspect_ranges import compute_normalization_ranges

        root = tmp_path / "render_outputs"
        d = 8
        for i in range(3):
            obj = root / f"obj{i}" / "sample_0"
            obj.mkdir(parents=True)
            mask = rng.uniform(size=(d, d, d)) < 0.5
            mat = np.zeros((d, d, d, 4), np.float32)
            mat[..., 3] = 7
            mat[mask, 0] = 10 ** rng.uniform(2, 3.5, mask.sum())
            mat[mask, 1] = 10 ** rng.uniform(4, 9, mask.sum())
            mat[mask, 2] = rng.uniform(0.25, 0.42, mask.sum())
            mat[mask, 3] = 0
            np.save(obj / "material_grid.npy", mat)
        # one problematic object: zero density in fg
        bad = root / "objbad" / "sample_0"
        bad.mkdir(parents=True)
        mat = np.zeros((d, d, d, 4), np.float32)
        mat[..., 3] = 7
        mat[0, 0, 0, 3] = 0  # fg voxel with density 0
        np.save(bad / "material_grid.npy", mat)

        ranges, problematic = compute_normalization_ranges(
            root, tmp_path / "stats", workers=1
        )
        assert problematic == ["objbad"]
        assert 2.0 <= ranges["density_p1"] <= ranges["density_p99"] <= 3.5
        assert (tmp_path / "stats" / "normalization_ranges.yaml").exists()
        # loader round trip
        from pixie_tpu.utils.norm import load_normalization_ranges

        r = load_normalization_ranges(tmp_path / "stats" / "normalization_ranges.yaml")
        assert abs(r.density_min - ranges["density_p1"]) < 1e-9


class TestPerClassMetrics:
    def test_class_report(self):
        from pixie_tpu.train.inference import generate_class_report

        per_object = {
            "a1": {"seg_acc": 0.9, "cont_mse": 0.1},
            "a2": {"seg_acc": 0.8, "cont_mse": 0.2},
            "b1": {"seg_acc": 0.5, "cont_mse": 0.4},
        }
        lookup = lambda oid: "trees" if oid.startswith("a") else "chairs"
        rep = generate_class_report(per_object, lookup)
        assert rep["trees"]["n_objects"] == 2
        np.testing.assert_allclose(rep["trees"]["seg_acc"]["mean"], 0.85)
        assert rep["chairs"]["seg_acc"]["n"] == 1


class TestViz:
    def test_pointcloud_image(self, rng):
        from pixie_tpu.utils.viz import render_pointcloud_image

        pts = rng.normal(size=(500, 3)).astype(np.float32)
        labels = rng.integers(0, 7, 500)
        img = render_pointcloud_image(pts, labels=labels, res=64)
        assert img.shape == (64, 64, 3)
        assert img.min() >= 0 and img.max() <= 1
        # some pixels must be colored (not all background)
        assert (img != 1.0).any()

    def test_empty_cloud(self):
        from pixie_tpu.utils.viz import render_pointcloud_image

        img = render_pointcloud_image(np.zeros((0, 3)), res=32)
        assert (img == 1.0).all()


class TestCuration:
    def test_similarity_selection_with_injected_embeddings(self):
        from pixie_tpu.data_curation.curation import select_top_objects_by_similarity

        vocab = {
            "tree": [1.0, 0.0], "oak tree": [0.9, 0.1], "metal box": [0.0, 1.0],
            "steel crate": [0.1, 0.9],
        }
        names = {"u1": "tree", "u2": "oak tree", "u3": "metal box",
                 "u4": "steel crate"}
        classes = {"trees": [1.0, 0.0], "metal_crates": [0.0, 1.0]}

        def embed(texts):
            table = {**vocab, "trees": classes["trees"],
                     "metal_crates": classes["metal_crates"]}
            return np.array([table[t] for t in texts], np.float32)

        cat = select_top_objects_by_similarity(names, list(classes), top_k=2,
                                               embed_fn=embed)
        assert cat["trees"] == ["u1", "u2"]
        assert cat["metal_crates"] == ["u3", "u4"]

    def test_obj_metadata_lookup(self, tmp_path):
        from pixie_tpu.data_curation.curation import (
            get_obj_class_for_id,
            load_obj_metadata,
        )

        meta = {"abc": {"obj_class": "trees"}, "def": {"obj_class": "chairs"}}
        p = tmp_path / "meta.json"
        p.write_text(json.dumps(meta))
        loaded = load_obj_metadata(p)
        assert get_obj_class_for_id("abc", loaded) == "trees"
        assert get_obj_class_for_id("zzz", loaded) is None


class TestMeshPaint:
    @staticmethod
    def _write_glb(path, verts, translation=None):
        """Minimal single-primitive GLB with float32 POSITION."""
        import struct

        bin_chunk = verts.astype("<f4").tobytes()
        pad = (-len(bin_chunk)) % 4
        bin_chunk += b"\x00" * pad
        node = {"mesh": 0}
        if translation is not None:
            node["translation"] = list(translation)
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [node],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{
                "bufferView": 0, "componentType": 5126, "count": len(verts),
                "type": "VEC3",
            }],
            "bufferViews": [{"buffer": 0, "byteOffset": 0,
                             "byteLength": len(bin_chunk)}],
            "buffers": [{"byteLength": len(bin_chunk)}],
        }
        js = json.dumps(gltf).encode()
        js += b" " * ((-len(js)) % 4)
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
            f.write(bin_chunk)

    def test_glb_parse_applies_node_transform(self, tmp_path):
        from pixie_tpu.utils.mesh_paint import load_glb_vertices

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        self._write_glb(tmp_path / "m.glb", verts, translation=[1.0, 2.0, 3.0])
        out = load_glb_vertices(tmp_path / "m.glb")
        np.testing.assert_allclose(out, verts + [1.0, 2.0, 3.0], atol=1e-6)

    def test_paint_modes_and_material_colors(self, tmp_path):
        from pixie_tpu.utils.io import make_material_vertex, read_ply, write_ply
        from pixie_tpu.utils.mesh_paint import (
            MATERIAL_COLORS, paint_mesh_with_predictions)

        rng = np.random.default_rng(0)
        # predictions: left half jelly (0), right half metal (1)
        pts = rng.uniform(-0.4, 0.4, (400, 3)).astype(np.float32)
        mats = (pts[:, 0] > 0).astype(np.int64)
        v = make_material_vertex(
            coords=pts, density=np.full(400, 300.0, np.float32),
            E=np.where(mats == 1, 1e7, 1e5).astype(np.float32),
            nu=np.full(400, 0.35, np.float32), material_id=mats,
        )
        write_ply(tmp_path / "mapped_preds.ply", v)
        # mesh: same cloud shape, different scale/offset
        mesh = (pts * 3.0 + 5.0).astype(np.float32)
        self._write_glb(tmp_path / "obj.glb", mesh)

        outs = paint_mesh_with_predictions(
            tmp_path / "obj.glb", tmp_path / "mapped_preds.ply",
            tmp_path / "painted", turntable_frames=2,
        )
        assert set(outs) >= {"material", "density", "E", "nu"}
        pv = read_ply(outs["material"])["vertex"]
        assert len(pv) == 400
        # right-half vertices must carry the metal palette color
        right = pv["x"] > 5.0
        exp = (MATERIAL_COLORS[1] * 255).astype(np.uint8)
        got = np.stack([pv["red"][right], pv["green"][right], pv["blue"][right]], -1)
        assert (np.abs(got.astype(int) - exp.astype(int)) <= 1).all()
        # E colormap must differ between halves
        ev = read_ply(outs["E"])["vertex"]
        left_c = ev["red"][~right].mean()
        right_c = ev["red"][right].mean()
        assert abs(left_c - right_c) > 30
        # turntable video (gif fallback allowed) exists
        vid = outs.get("material_video")
        assert vid is not None and (Path(vid).exists()
                                    or Path(vid).with_suffix(".gif").exists())


class TestManualFilter:
    def test_correction_workflow(self, tmp_path):
        from pixie_tpu.data_curation.manual_filter import main

        meta = tmp_path / "meta.json"
        meta.write_text(json.dumps({
            "a1": {"obj_class": "metal_crates"},
            "a2": "shrubs",  # legacy string entry
        }))
        base = ["--metadata", str(meta)]
        assert main(base + ["accept", "a1"]) == 0
        assert main(base + ["reject", "a2", "--reason", "bad render"]) == 0
        data = json.loads(meta.read_text())
        assert data["a1"]["accepted"] is True
        # legacy entry upgraded to dict form, class preserved
        assert data["a2"] == {"obj_class": "shrubs", "accepted": False,
                              "reason": "bad render"}
        # audit log exists with two entries
        log = meta.with_suffix(".json.corrections.log")
        assert len(log.read_text().splitlines()) == 2
        # batch apply flips a2 back
        corr = tmp_path / "c.json"
        corr.write_text(json.dumps({"a2": {"accepted": True}}))
        assert main(base + ["apply", str(corr)]) == 0
        assert json.loads(meta.read_text())["a2"]["accepted"] is True

    def test_stats_and_filter(self, tmp_path):
        from pixie_tpu.data_curation.manual_filter import (
            filter_objects, stats)

        meta = {"x": {"obj_class": "c1", "accepted": True},
                "y": {"obj_class": "c1"},
                "z": {"obj_class": "c2", "accepted": False}}
        s = stats(meta)
        assert s["c1"] == {"total": 2, "accepted": 1, "rejected": 0,
                           "unreviewed": 1}
        assert list(filter_objects(meta, status="rejected")) == ["z"]
        assert list(filter_objects(meta, obj_class="c1")) == ["x", "y"]


class TestRenderPool:
    """Parallel Blender render pool (data_curation/render_pool.py;
    reference render_objaverse_classes.py:12-73)."""

    def test_build_jobs_round_robin_and_caps(self, tmp_path):
        from pixie_tpu.data_curation.render_pool import build_render_jobs

        ds = {"chair": ["a", "b", "c"], "plant": ["d"]}
        jobs = build_render_jobs(ds, tmp_path, tmp_path / "out",
                                 max_objs_per_class=2, num_gpus=2)
        assert [j["uid"] for j in jobs] == ["a", "b", "d"]
        assert [j["gpu_id"] for j in jobs] == [0, 1, 0]
        assert jobs[0]["output_dir"].endswith("chair/a")

    def test_pool_runs_and_reports_failures(self, tmp_path):
        from pixie_tpu.data_curation import render_pool as rp

        jobs = [{"uid": u, "glb": "x.glb", "output_dir": str(tmp_path / u)}
                for u in "abc"]
        results = rp.render_pool(jobs, num_workers=2,
                                 worker_fn=_fake_render)
        assert results == [True, False, True]

    def test_skip_already_rendered(self, tmp_path):
        from pixie_tpu.data_curation.render_pool import render_object

        out = tmp_path / "done"
        out.mkdir()
        (out / "0.png").write_bytes(b"")
        assert render_object({"uid": "x", "glb": "missing.glb",
                              "output_dir": str(out)})


def _fake_render(job):
    # module-level for pickling into pool workers
    return job["uid"] != "b"
