"""Trainer / inference tests on the virtual 8-device CPU mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

from pixie_tpu.utils.norm import REFERENCE_RANGES


def make_fixture_dataset(root: Path, n_objects=3, d=8, c_feat=12):
    """Synthesize render_outputs/{obj}/ artifact dirs with the real contract."""
    rng = np.random.default_rng(0)
    for i in range(n_objects):
        obj = root / f"obj{i:03d}"
        (obj / "sample_0").mkdir(parents=True)
        feat = rng.normal(size=(d, d, d, c_feat)).astype(np.float32)
        mask = (rng.uniform(size=(d, d, d)) < 0.4).astype(np.float32)
        mat_id = np.where(mask > 0, rng.integers(0, 7, (d, d, d)), 7)
        density = np.where(mask > 0, 10 ** rng.uniform(2.0, 3.5, (d, d, d)), 0.0)
        E = np.where(mask > 0, 10 ** rng.uniform(4.0, 9.0, (d, d, d)), 0.0)
        nu = np.where(mask > 0, rng.uniform(0.25, 0.42, (d, d, d)), 0.0)
        mat = np.stack([density, E, nu, mat_id], -1).astype(np.float32)
        np.save(obj / "clip_features_features.npy", feat)
        np.save(obj / "clip_features_mask.npy", mask)
        np.save(obj / "sample_0" / "material_grid.npy", mat)
    return root


@pytest.fixture
def fixture_dataset(tmp_path):
    from pixie_tpu.train.data import MaterialVoxelDataset

    root = make_fixture_dataset(tmp_path / "render_outputs")
    return MaterialVoxelDataset(
        root, REFERENCE_RANGES, grid_size=8, feature_channels=12,
    )


SMALL = dict(
    feature_channels=12, cond_dim=8, model_channels=8, num_res_blocks=1,
    channel_mult=(1, 2), grid_size=8,
)


class TestDataset:
    def test_loads_and_normalizes(self, fixture_dataset):
        assert len(fixture_dataset) == 3
        feat, cont, mat_id, mask, info = fixture_dataset[0]
        assert feat.shape == (8, 8, 8, 12)
        assert cont.shape == (8, 8, 8, 3)
        assert cont.min() >= -1.0 and cont.max() <= 1.0
        assert (mat_id[mask == 0] == 7).all()

    def test_skips_bad_material_ids(self, tmp_path):
        from pixie_tpu.train.data import MaterialVoxelDataset

        root = make_fixture_dataset(tmp_path / "render_outputs", n_objects=2)
        # corrupt one object's material ids
        bad = np.load(root / "obj000" / "sample_0" / "material_grid.npy")
        bad[..., -1] = 99
        np.save(root / "obj000" / "sample_0" / "material_grid.npy", bad)
        ds = MaterialVoxelDataset(root, REFERENCE_RANGES, grid_size=8, feature_channels=12)
        assert len(ds) == 1

    def test_mask_consistency_enforced(self, tmp_path):
        from pixie_tpu.train.data import MaterialVoxelDataset

        root = make_fixture_dataset(tmp_path / "render_outputs", n_objects=1)
        mask = np.load(root / "obj000" / "clip_features_mask.npy")
        mask[0, 0, 0] = 1.0 - mask[0, 0, 0]
        np.save(root / "obj000" / "clip_features_mask.npy", mask)
        ds = MaterialVoxelDataset(root, REFERENCE_RANGES, grid_size=8, feature_channels=12)
        with pytest.raises(AssertionError, match="Mask inconsistency"):
            ds[0]


class TestTrainer:
    def test_discrete_loss_decreases(self, fixture_dataset, tmp_path):
        from pixie_tpu.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(mode="discrete", batch_size=2, epochs=1, lr=1e-3, **SMALL)
        trainer = Trainer(cfg)
        trainer.setup(steps_per_epoch=1)
        feat, cont, mat_id, mask, info = fixture_dataset[0]
        batch = (feat[None].repeat(2, 0), mat_id[None].repeat(2, 0), mask[None].repeat(2, 0))
        losses = [float(trainer.train_step(batch)[0]) for _ in range(8)]
        assert losses[-1] < losses[0]

    def test_continuous_loss_decreases(self, fixture_dataset):
        from pixie_tpu.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(mode="continuous", batch_size=2, epochs=1, lr=1e-3, **SMALL)
        trainer = Trainer(cfg)
        trainer.setup(steps_per_epoch=1)
        feat, cont, mat_id, mask, info = fixture_dataset[0]
        batch = (feat[None].repeat(2, 0), cont[None].repeat(2, 0), mask[None].repeat(2, 0))
        losses = [float(trainer.train_step(batch)[0]) for _ in range(8)]
        assert losses[-1] < losses[0]

    def test_batch_is_dp_sharded(self, fixture_dataset):
        import jax

        from pixie_tpu.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(mode="discrete", batch_size=8, **SMALL)
        trainer = Trainer(cfg)
        trainer.setup(steps_per_epoch=1)
        feat, cont, mat_id, mask, info = fixture_dataset[0]
        batch = (
            np.repeat(feat[None], 8, 0), np.repeat(mat_id[None], 8, 0),
            np.repeat(mask[None], 8, 0),
        )
        loss, aux = trainer.train_step(batch)
        assert np.isfinite(float(loss))
        # params stay replicated over the 8-device mesh
        leaf = jax.tree.leaves(trainer.params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_checkpoint_roundtrip(self, fixture_dataset, tmp_path):
        import jax

        from pixie_tpu.train.trainer import TrainConfig, Trainer, latest_checkpoint

        cfg = TrainConfig(mode="discrete", batch_size=2, **SMALL)
        trainer = Trainer(cfg)
        trainer.setup(steps_per_epoch=1)
        p = trainer.save_checkpoint(tmp_path / "ckpts", epoch=3)
        assert latest_checkpoint(tmp_path / "ckpts").name == "epoch_3"

        trainer2 = Trainer(cfg)
        trainer2.setup(steps_per_epoch=1)
        trainer2.load_checkpoint(p)
        for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert trainer2.epoch == 3

    def test_train_loop_end_to_end(self, fixture_dataset, tmp_path):
        from pixie_tpu.train.trainer import TrainConfig, train_loop

        cfg = TrainConfig(mode="discrete", batch_size=2, epochs=2, save_interval=1,
                          **SMALL)
        trainer, history = train_loop(cfg, fixture_dataset, tmp_path / "ck",
                                      max_steps=4)
        assert (tmp_path / "ck" / "train_test_splits.json").exists()
        assert len(history) >= 1


class TestInference:
    def test_run_inference_artifacts_and_metrics(self, fixture_dataset, tmp_path):
        from pixie_tpu.train.trainer import TrainConfig, Trainer
        from pixie_tpu.train.inference import run_inference

        cfg_d = TrainConfig(mode="discrete", **SMALL)
        cfg_c = TrainConfig(mode="continuous", **SMALL)
        td, tc = Trainer(cfg_d), Trainer(cfg_c)
        td.setup(1)
        tc.setup(1)
        seg_p = td.save_checkpoint(tmp_path / "seg", 0)
        cont_p = tc.save_checkpoint(tmp_path / "cont", 0)

        model_kwargs = dict(
            cond_dim=8, model_channels=8, num_res_blocks=1, channel_mult=(1, 2)
        )
        report = run_inference(
            fixture_dataset, seg_p, cont_p, tmp_path / "out", batch_size=2,
            model_kwargs=model_kwargs,
        )
        assert report["n_objects"] == 3
        pred = np.load(tmp_path / "out" / "obj000" / "sample_0_pred.npy")
        assert pred.shape == (3 + 8, 8, 8, 8)
        # one-hot channels sum to 1 everywhere
        np.testing.assert_allclose(pred[3:].sum(0), 1.0)
        assert (tmp_path / "out" / "metrics.json").exists()
        m = json.loads((tmp_path / "out" / "metrics.json").read_text())
        assert "seg_acc" in m and "n" in m["seg_acc"]

    def test_device_path_matches_file_path(self, fixture_dataset, tmp_path):
        """infer_single_device (the pipeline's voxelizer->U-Net device
        handoff) must produce the identical sample_0_pred.npy the batched
        file path writes."""
        import jax.numpy as jnp

        from pixie_tpu.train.inference import (
            CombinedInference, infer_single_device, load_params, run_inference,
        )
        from pixie_tpu.train.trainer import TrainConfig, Trainer

        cfg_d = TrainConfig(mode="discrete", **SMALL)
        cfg_c = TrainConfig(mode="continuous", **SMALL)
        td, tc = Trainer(cfg_d), Trainer(cfg_c)
        td.setup(1)
        tc.setup(1)
        seg_p = td.save_checkpoint(tmp_path / "seg", 0)
        cont_p = tc.save_checkpoint(tmp_path / "cont", 0)
        model_kwargs = dict(
            cond_dim=8, model_channels=8, num_res_blocks=1, channel_mult=(1, 2)
        )
        run_inference(
            fixture_dataset, seg_p, cont_p, tmp_path / "file_out",
            batch_size=2, model_kwargs=model_kwargs,
        )
        feat, _, _, mask, info = fixture_dataset[0]
        infer = CombinedInference(
            load_params(seg_p), load_params(cont_p), grid_size=8,
            feature_channels=12, model_kwargs=model_kwargs,
        )
        pred_path = infer_single_device(
            infer, jnp.asarray(feat, jnp.float16), mask,
            info["obj_id"], 0, tmp_path / "dev_out",
        )
        got = np.load(pred_path)
        ref = np.load(tmp_path / "file_out" / info["obj_id"] / "sample_0_pred.npy")
        # fp16 handoff vs f32 file read: one-hot classes must agree exactly,
        # continuous channels to fp16 input precision
        np.testing.assert_array_equal(got[3:], ref[3:])
        np.testing.assert_allclose(got[:3], ref[:3], atol=5e-3)
        assert (tmp_path / "dev_out" / info["obj_id"] / "sample_0_mask.npy").exists()


class TestSpatialSharding:
    """Voxel z-axis sharded over the sp mesh axis (dp x sp GSPMD)."""

    def test_sp_sharded_step_matches_dp_only(self, fixture_dataset):
        import jax

        from pixie_tpu.parallel.mesh import get_mesh
        from pixie_tpu.train.trainer import TrainConfig, Trainer

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs the virtual 8-device mesh")
        feat, cont, mat_id, mask, info = fixture_dataset[0]
        batch = (
            np.repeat(feat[None], 4, 0), np.repeat(mat_id[None], 4, 0),
            np.repeat(mask[None], 4, 0),
        )

        def run(mesh):
            cfg = TrainConfig(mode="discrete", batch_size=4, **SMALL)
            t = Trainer(cfg, mesh=mesh)
            t.setup(steps_per_epoch=1)
            loss, aux = t.train_step(batch)
            return float(loss), t

        loss_dp, _ = run(get_mesh(dp=8, sp=1))
        loss_sp, trainer = run(get_mesh(dp=4, sp=2))
        assert abs(loss_dp - loss_sp) < 1e-4
        # the input really is z-sharded: the jitted step saw a (dp, sp) layout
        sh = trainer._batch_sharding(5)
        assert sh.spec == jax.sharding.PartitionSpec("dp", "sp", None, None, None)
