"""pipeline.py stage-function integration (reference pipeline.py:438-517).

Drives the orchestrator's own stage functions against a synthetic asset:
voxelize (async background fetch) -> neural segmentation via the
device-resident fast path (voxelizer features_dev -> U-Net, no disk
round-trip) -> mapped_preds.ply, then joins the background drain and
checks the on-disk artifact matches the device buffer bit-for-bit.
"""

from pathlib import Path

import numpy as np

from pixie_tpu.utils.io import read_ply


class SphereField:
    """Synthetic feature field: dense sphere r=0.3 at the origin."""

    def __init__(self, feat_dim=48):
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


def test_voxels_to_neural_fast_path(tmp_path, monkeypatch):
    import pipeline
    from pixie_tpu.config import compose
    from pixie_tpu.train.trainer import TrainConfig, Trainer
    from pixie_tpu.utils.paths import (
        create_directories, get_output_paths, resolve_paths,
    )

    d, c = 16, 48  # tiny grid; c > cond_dim so the joint U-Net path engages
    cfg = compose(overrides=[
        "obj_id=testobj",
        f"paths.base_path={tmp_path}",
        f"voxelization.grid_size={d}",
        "voxelization.batch_size=2048",
        f"training.default_grid_size={d}",
        f"training.features.clip.feature_channels={c}",
    ])
    cfg = resolve_paths(cfg)
    assert int(cfg.training.feature_channels) == c  # interpolation resolved
    paths = get_output_paths(cfg, cfg.obj_id)
    create_directories(paths)

    # stand in for a trained feature field (train_nerf's artifact)
    monkeypatch.setattr(
        "pixie_tpu.recon.field_adapter.load_field_adapter",
        lambda _ckpt: SphereField(c),
    )

    pipeline.generate_voxels(cfg, paths)
    vox = paths["_vox_handoff"]
    assert "features_dev" in vox and "wait" in vox

    # production-shape checkpoints at the tiny grid/feature size
    for mode, ckpt_dir in (
        ("discrete", cfg.paths.discrete_checkpoint_dir),
        ("continuous", cfg.paths.continuous_checkpoint_dir),
    ):
        tr = Trainer(TrainConfig(mode=mode, feature_channels=c, grid_size=d))
        tr.setup(1)
        tr.save_checkpoint(ckpt_dir, 0)

    mapped_ply = pipeline.generate_neural_segmentation(cfg, paths)
    assert Path(mapped_ply).exists()
    verts = read_ply(mapped_ply)["vertex"]
    mask = np.load(Path(paths["render_output"]) / "clip_features_mask.npy")
    assert len(verts) == int((mask > 0).sum()) > 0

    # the fast path must have used the device handoff (pred written by
    # infer_single_device, which records its source in the info json)
    import json

    info = json.loads(
        (Path(paths["neural_base_dir"]) / "testobj" / "sample_0_info.json")
        .read_text())
    assert "device-resident" in info["source"]

    # join the background feature drain; artifact == device buffer
    pipeline._finish_voxel_fetch(paths)
    feats = np.load(Path(paths["render_output"]) / "clip_features_features.npy")
    np.testing.assert_array_equal(feats, np.asarray(vox["features_dev"]))
    assert feats.shape == (d, d, d, c)


def test_neural_stage_slow_path_waits_for_drain(tmp_path, monkeypatch):
    """Without an in-process handoff (stage re-run), the slow path must
    join any pending voxel drain before the dataset reads the npy."""
    import pipeline

    called = []
    paths = {"_vox_handoff": {"wait": lambda: called.append(1) or {}}}
    pipeline._finish_voxel_fetch(paths)
    assert called == [1]
    assert "wait" not in paths["_vox_handoff"]  # popped: join is one-shot
    pipeline._finish_voxel_fetch(paths)  # idempotent
    assert called == [1]
