"""COLMAP real-scene ingestion (reference: f3rm_config.py:40-52 COLMAP
dataparser switch + gaussian-splatting/scene/colmap_loader.py)."""

import json
import struct

import numpy as np
import pytest


def _write_synthetic_model(root, n_views=6, n_pts=50, binary=True):
    """Emit a tiny COLMAP capture: orbit cameras looking at the origin,
    a PINHOLE camera, a sparse point cloud, and 16x16 images."""
    from PIL import Image

    from pixie_tpu.recon.colmap import qvec2rotmat

    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    img_dir = root / "images"
    img_dir.mkdir()

    w = h = 16
    fx = fy = 20.0
    cx, cy = w / 2.0, h / 2.0

    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.3, 0.3, (n_pts, 3))
    rgbs = rng.integers(0, 255, (n_pts, 3))

    views = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        cam_pos = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 1.0])
        # camera looks at the origin: build w2c with +z forward (OpenCV)
        fwd = -cam_pos / np.linalg.norm(cam_pos)
        upw = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, upw)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        r_w2c = np.stack([right, down, fwd])  # rows = camera axes in world
        t = -r_w2c @ cam_pos
        # rotation -> wxyz quaternion, branch on the dominant diagonal
        # (the trace>0 shortcut alone breaks for 180-degree-ish views)
        m = r_w2c
        tr = m[0, 0] + m[1, 1] + m[2, 2]
        if tr > 0:
            s = 2 * np.sqrt(tr + 1.0)
            q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                          (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
        elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
            s = 2 * np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2])
            q = np.array([(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                          (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s])
        elif m[1, 1] >= m[2, 2]:
            s = 2 * np.sqrt(1.0 - m[0, 0] + m[1, 1] - m[2, 2])
            q = np.array([(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
                          0.25 * s, (m[1, 2] + m[2, 1]) / s])
        else:
            s = 2 * np.sqrt(1.0 - m[0, 0] - m[1, 1] + m[2, 2])
            q = np.array([(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
                          (m[1, 2] + m[2, 1]) / s, 0.25 * s])
        np.testing.assert_allclose(qvec2rotmat(q), r_w2c, atol=1e-6)
        name = f"frame_{i:03d}.png"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(img_dir / name)
        views.append((i + 1, q, t, 1, name))

    if binary:
        with open(sparse / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, w, h))  # PINHOLE
            f.write(struct.pack("<4d", fx, fy, cx, cy))
        with open(sparse / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(views)))
            for iid, q, t, cid, name in views:
                f.write(struct.pack("<i", iid))
                f.write(struct.pack("<7d", *q, *t))
                f.write(struct.pack("<i", cid))
                f.write(name.encode() + b"\x00")
                n2d = 3  # a few dummy 2D tracks to exercise the skip
                f.write(struct.pack("<Q", n2d))
                for _ in range(n2d):
                    f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        with open(sparse / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", n_pts))
            for i in range(n_pts):
                f.write(struct.pack("<Q", i + 1))
                f.write(struct.pack("<3d", *pts[i]))
                f.write(struct.pack("<3B", *rgbs[i]))
                f.write(struct.pack("<d", 0.5))
                tl = int(rng.integers(0, 4))
                f.write(struct.pack("<Q", tl))
                for _ in range(tl):
                    f.write(struct.pack("<ii", 1, 2))
    else:
        (sparse / "cameras.txt").write_text(
            f"# comment\n1 PINHOLE {w} {h} {fx} {fy} {cx} {cy}\n")
        lines = ["# images"]
        for iid, q, t, cid, name in views:
            lines.append(
                f"{iid} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} "
                f"{cid} {name}")
            lines.append("1.0 2.0 -1")
        (sparse / "images.txt").write_text("\n".join(lines) + "\n")
        (sparse / "points3D.txt").write_text(
            "# pts\n" + "\n".join(
                f"{i+1} {pts[i,0]} {pts[i,1]} {pts[i,2]} "
                f"{rgbs[i,0]} {rgbs[i,1]} {rgbs[i,2]} 0.5"
                for i in range(n_pts)) + "\n")
    return pts


@pytest.mark.parametrize("binary", [True, False])
def test_load_colmap_dataset(tmp_path, binary):
    from pixie_tpu.recon.colmap import load_colmap_dataset

    pts_world = _write_synthetic_model(tmp_path, binary=binary)
    ds = load_colmap_dataset(tmp_path)

    assert ds["images"].shape == (6, 16, 16, 3)
    assert ds["c2w"].shape == (6, 4, 4)
    fx, fy, cx, cy = ds["intrinsics"]
    assert fx == fy == 20.0 and cx == cy == 8.0
    assert ds["points3d"].shape == pts_world.shape

    # NeRF convention: the camera looks down its -z axis; every synthetic
    # view points at the WORLD origin — map it through the dataparser
    # transform and check the look direction hits it exactly
    from pixie_tpu.recon.colmap import apply_dataparser_transform

    c2w = ds["c2w"]
    center_train = apply_dataparser_transform(
        np.zeros((1, 3)), ds["dataparser_transform"], ds["dataparser_scale"])
    look = -c2w[:, :3, 2]
    to_center = center_train - c2w[:, :3, 3]
    cos = (look * to_center).sum(1) / (
        np.linalg.norm(look, axis=1) * np.linalg.norm(to_center, axis=1))
    assert (cos > 0.999).all(), "cameras must look toward the world origin"

    # auto-scale: translations bounded by 1
    assert np.abs(c2w[:, :3, 3]).max() <= 1.0 + 1e-5

    # rotations stay orthonormal after orientation
    rtr = np.einsum("nij,nik->njk", c2w[:, :3, :3], c2w[:, :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                               atol=1e-5)


def test_dataparser_roundtrip(tmp_path):
    """apply_dataparser_transform must be the exact inverse of
    map_pred_to_coords.transform_nerf_to_world's world recovery."""
    from pixie_tpu.recon.colmap import (
        apply_dataparser_transform,
        load_colmap_dataset,
        write_dataparser_transforms,
    )

    pts_world = _write_synthetic_model(tmp_path)
    ds = load_colmap_dataset(tmp_path)
    tr, sc = ds["dataparser_transform"], ds["dataparser_scale"]

    p_train = apply_dataparser_transform(pts_world, tr, sc)
    np.testing.assert_allclose(p_train, ds["points3d"], atol=1e-5)

    # the inverse used by transform_nerf_to_world (voxel/map_pred_to_coords)
    dp_path = tmp_path / "dataparser_transforms.json"
    write_dataparser_transforms(dp_path, tr, sc)
    dp = json.loads(dp_path.read_text())
    t = np.eye(4)
    t[:3, :] = np.asarray(dp["transform"])
    back = (np.linalg.inv(t) @ np.concatenate(
        [p_train / dp["scale"], np.ones((len(p_train), 1))], 1).T).T[:, :3]
    np.testing.assert_allclose(back, pts_world, atol=1e-4)


def test_dispatcher(tmp_path):
    from pixie_tpu.recon.train_field import load_dataset

    _write_synthetic_model(tmp_path)
    ds = load_dataset(tmp_path)
    assert "dataparser_transform" in ds

    with pytest.raises(FileNotFoundError):
        load_dataset(tmp_path / "nonexistent")
