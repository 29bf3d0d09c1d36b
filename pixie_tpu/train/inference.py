"""Combined U-Net inference: discrete + continuous nets over the test set.

Port of trainer/inference_combined.py: loads both checkpoints (orbax native
or torch epoch_*.pth via the converter), runs batched forward passes sharded
over the mesh 'dp' axis (replacing DDP dataset sharding,
inference_combined.py:247-256), writes per-object artifacts
(sample_{k}_pred.npy with 3 continuous channels + one-hot argmax classes,
sample_{k}_gt.npy, sample_{k}_mask.npy, inference_combined.py:173-217) and
aggregate metrics.json / per_class_metrics.json (pixie/metrics.py).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pixie_tpu.models.unet3d import RegressionUNet, SegmentationUNet
from pixie_tpu.parallel.mesh import get_mesh
from pixie_tpu.train.data import MaterialVoxelDataset
from pixie_tpu.utils.metrics import masked_mean, mean_se_ci90


def load_params(path: str | Path):
    """Load either an orbax checkpoint dir or a torch .pth file."""
    path = Path(path)
    if path.suffix == ".pth":
        from pixie_tpu.models.convert_torch import load_torch_checkpoint  # noqa: PLC0415

        return load_torch_checkpoint(str(path))["params"]
    import orbax.checkpoint as ocp  # noqa: PLC0415

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path.resolve())
    return restored["params"] if "params" in restored else restored


class CombinedInference:
    def __init__(
        self,
        seg_params,
        cont_params,
        grid_size: int = 64,
        feature_channels: int = 768,
        num_classes: int = 8,
        background_id: int = 7,
        mesh=None,
        model_kwargs: dict | None = None,
        use_joint: bool = True,
    ):
        kw = dict(
            feature_channels=feature_channels, grid_size=grid_size,
            **(model_kwargs or {}),
        )
        self.mesh = mesh if mesh is not None else get_mesh()
        repl = NamedSharding(self.mesh, P())
        self.num_classes = num_classes
        self.background_id = background_id
        self._data_sharding = NamedSharding(self.mesh, P("dp"))

        # lane-packed joint net: both U-Nets in one C=128 pass (exact same
        # math, ~1.26x faster on v5e; models/joint.py).  Requires the deep
        # projector path, so feature ablations fall back to the pair.
        use_joint = use_joint and feature_channels > kw.get("cond_dim", 32)
        if use_joint:
            from pixie_tpu.models.joint import (  # noqa: PLC0415
                JointMaterialUNet, fuse_material_unets,
            )

            joint = JointMaterialUNet(
                num_classes=num_classes, cont_channels=3, **kw)
            joint_params = fuse_material_unets(
                seg_params, cont_params,
                model_channels=kw.get("model_channels", 64),
                channel_mult=kw.get("channel_mult", (1, 1, 2, 4)),
                num_res_blocks=kw.get("num_res_blocks", 3),
            )
            self.joint_params = jax.device_put(joint_params, repl)

            @jax.jit
            def fwd_joint(params, feat):
                return joint.apply({"params": params}, feat)

            self._fwd = lambda feat: fwd_joint(self.joint_params, feat)
            return

        self.seg_model = SegmentationUNet(num_classes=num_classes, **kw)
        self.cont_model = RegressionUNet(out_channels=3, **kw)
        self.seg_params = jax.device_put(seg_params, repl)
        self.cont_params = jax.device_put(cont_params, repl)

        @jax.jit
        def fwd(seg_params, cont_params, feat):
            seg_logits = self.seg_model.apply({"params": seg_params}, feat)
            cont_pred = self.cont_model.apply({"params": cont_params}, feat)
            return seg_logits, cont_pred

        self._fwd = lambda feat: fwd(self.seg_params, self.cont_params, feat)

    def predict(self, feat: np.ndarray):
        """feat (B,D,H,W,C) -> (seg_logits (B,D,H,W,K), cont (B,D,H,W,3)).
        Pads the batch to a multiple of the mesh dp axis and slices back."""
        feat = np.asarray(feat, np.float32)
        b = feat.shape[0]
        dp = self.mesh.shape["dp"]
        pad = (-b) % dp
        if pad:
            feat = np.concatenate([feat, np.repeat(feat[-1:], pad, 0)])
        feat = jax.device_put(jnp.asarray(feat), self._data_sharding)
        seg, cont = self._fwd(feat)
        return seg[:b], cont[:b]

    def predict_device(self, feat_dev):
        """Single-sample device-resident forward: feat_dev (D,H,W,C) jax
        array (any float dtype, e.g. the voxelizer's fp16 ``features_dev``)
        -> (seg_logits (D,H,W,K), cont (D,H,W,3)), still on device.

        Pipeline fast path: U-Net inference starts straight from the
        voxelizer's device buffer, before (and concurrent with) the feature
        grid's 400 MB host-artifact fetch (reference inference_combined.py
        always round-trips through dataset files)."""
        feat = jnp.asarray(feat_dev, jnp.float32)[None]
        seg, cont = self._fwd(feat)
        return seg[0], cont[0]

    def combined_prediction(self, seg_logits, cont_pred) -> np.ndarray:
        """(3+K, D, H, W) with one-hot argmax classes
        (save_predictions, inference_combined.py:189-199)."""
        seg_pred = np.argmax(np.asarray(seg_logits), axis=-1)  # (D,H,W)
        cont = np.moveaxis(np.asarray(cont_pred), -1, 0)  # (3,D,H,W)
        onehot = np.eye(self.num_classes, dtype=np.float32)[seg_pred]  # (D,H,W,K)
        onehot = np.moveaxis(onehot, -1, 0)
        return np.concatenate([cont, onehot], axis=0)


def run_inference(
    dataset: MaterialVoxelDataset,
    seg_ckpt: str | Path,
    cont_ckpt: str | Path,
    output_dir: str | Path,
    batch_size: int = 4,
    indices=None,
    model_kwargs: dict | None = None,
    obj_class_lookup=None,
) -> dict:
    """Full inference pass: per-object artifacts + metrics report."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    infer = CombinedInference(
        load_params(seg_ckpt), load_params(cont_ckpt),
        grid_size=dataset.grid_size,
        feature_channels=dataset.feature_channels,
        num_classes=dataset.num_material_classes,
        background_id=dataset.background_id,
        model_kwargs=model_kwargs,
    )

    per_object = {}
    for feat, cont_gt, mat_id, mask, infos, n_valid in dataset.batches(
        batch_size, indices, pad_to_batch=True
    ):
        seg_logits, cont_pred = infer.predict(feat)
        seg_logits = np.asarray(seg_logits)[:n_valid]
        cont_pred = np.asarray(cont_pred)[:n_valid]

        for i in range(n_valid):
            obj_id = infos[i]["obj_id"]
            sample_id = infos[i]["sample_id"]
            fg = mask[i]
            diff_sq = (cont_pred[i] - cont_gt[i]) ** 2

            pred_cls = np.argmax(seg_logits[i], axis=-1)
            valid = fg > 0
            acc = float(
                ((pred_cls == mat_id[i]) & valid).sum() / max(valid.sum(), 1)
            )
            dens = float(diff_sq[..., 0][valid].mean()) if valid.any() else 0.0
            yng = float(diff_sq[..., 1][valid].mean()) if valid.any() else 0.0
            poi = float(diff_sq[..., 2][valid].mean()) if valid.any() else 0.0
            per_object[obj_id] = {
                "seg_acc": acc,
                "density_mse": dens,
                "youngs_mse": yng,
                "poisson_mse": poi,
                "cont_mse": (dens + yng + poi) / 3.0,
            }

            obj_dir = output_dir / obj_id
            obj_dir.mkdir(exist_ok=True)
            combined = infer.combined_prediction(seg_logits[i], cont_pred[i])
            np.save(obj_dir / f"sample_{sample_id}_pred.npy", combined)
            gt = np.concatenate(
                [np.moveaxis(cont_gt[i], -1, 0), mat_id[i][None].astype(np.float32)], 0
            )
            np.save(obj_dir / f"sample_{sample_id}_gt.npy", gt)
            np.save(obj_dir / f"sample_{sample_id}_mask.npy", mask[i])
            with open(obj_dir / f"sample_{sample_id}_info.json", "w") as f:
                json.dump(infos[i], f)

    report = generate_metrics_report(per_object)
    (output_dir / "metrics.json").write_text(json.dumps(report, indent=2))
    (output_dir / "evaluated_obj_ids.json").write_text(
        json.dumps(sorted(per_object.keys()))
    )
    if obj_class_lookup is not None:
        per_class = generate_class_report(per_object, obj_class_lookup)
        (output_dir / "per_class_metrics.json").write_text(
            json.dumps(per_class, indent=2)
        )
    logging.info("Inference complete: %d objects -> %s", len(per_object), output_dir)
    return report


def infer_single_device(
    infer: CombinedInference,
    feat_dev,
    mask: np.ndarray,
    obj_id: str,
    sample_id: int,
    output_dir: str | Path,
) -> Path:
    """Device-resident single-object inference (pipeline fast path).

    Takes the voxelizer's on-device feature grid (``paths["features_dev"]``)
    instead of reading ``clip_features_features.npy`` from disk, so the
    U-Net runs while the voxel-feature host fetch is still draining on its
    background thread.  Writes the same ``sample_{k}_pred.npy`` /
    ``sample_{k}_mask.npy`` / ``sample_{k}_info.json`` artifacts as
    ``run_inference`` (inference_combined.py:173-217); GT metrics are
    skipped (fresh objects have no ground-truth material grid).
    """
    output_dir = Path(output_dir)
    obj_dir = output_dir / obj_id
    obj_dir.mkdir(parents=True, exist_ok=True)
    seg, cont = infer.predict_device(feat_dev)
    combined = infer.combined_prediction(np.asarray(seg), np.asarray(cont))
    pred_path = obj_dir / f"sample_{sample_id}_pred.npy"
    np.save(pred_path, combined)
    np.save(obj_dir / f"sample_{sample_id}_mask.npy",
            np.asarray(mask, np.float32))
    (obj_dir / f"sample_{sample_id}_info.json").write_text(
        json.dumps({"obj_id": obj_id, "sample_id": sample_id,
                    "source": "device-resident voxelizer handoff"}))
    logging.info("Device-resident inference: %s -> %s", obj_id, pred_path)
    return pred_path


def generate_metrics_report(per_object: dict) -> dict:
    """Aggregate mean +/- SE / CI90 (pixie/metrics.py:333-415)."""
    report: dict = {"n_objects": len(per_object), "per_object": per_object}
    if per_object:
        keys = next(iter(per_object.values())).keys()
        for k in keys:
            report[k] = mean_se_ci90(np.array([m[k] for m in per_object.values()]))
    return report


def generate_class_report(per_object: dict, obj_class_lookup) -> dict:
    """Per-class metric tables (generate_class_table, pixie/metrics.py:226)."""
    by_class: dict[str, list] = {}
    for obj_id, m in per_object.items():
        by_class.setdefault(obj_class_lookup(obj_id) or "unknown", []).append(m)
    out = {}
    for cls, ms in sorted(by_class.items()):
        entry = {"n_objects": len(ms)}
        for k in ms[0]:
            entry[k] = mean_se_ci90(np.array([m[k] for m in ms]))
        out[cls] = entry
    return out
