"""Field adapter: world-space point queries against a trained field.

Port of f3rm_robot/field_adapter.py:28-72 (FeatureFieldAdapter): density,
alpha, RGB and distilled features per (x,y,z), with the world->NeRF transform
applied on the fly (identity for Objaverse; dataparser_transforms.json for
real scenes — f3rm_robot/load.py:136-169).

Implements the duck-type the voxelizer consumes:
  query(points) -> {"density", "feature"};  get_rgb(points) -> (B,3).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pixie_tpu.recon.field import FeatureField, NerfField


class FieldAdapter:
    def __init__(self, nerf_params, feat_params=None, feature_dim: int = 768,
                 world_to_nerf_scale: float = 1.0,
                 world_to_nerf_transform: np.ndarray | None = None,
                 encoding: str = "mxu"):
        self.nerf = NerfField(encoding=encoding)
        self.feat = (FeatureField(feature_dim=feature_dim, encoding=encoding)
                     if feat_params else None)
        self.nerf_params = nerf_params
        self.feat_params = feat_params
        self.scale = float(world_to_nerf_scale)
        self.transform = (
            np.asarray(world_to_nerf_transform, np.float32)
            if world_to_nerf_transform is not None
            else None
        )

        @jax.jit
        def _query(nerf_params, feat_params, pts01):
            density = self.nerf.apply(nerf_params, pts01, None, True)
            if self.feat is not None:
                feature = self.feat.apply(feat_params, pts01)
            else:
                feature = jnp.concatenate(
                    [density, jnp.zeros_like(density)], axis=-1
                )
            return density, feature

        @jax.jit
        def _rgb(nerf_params, pts01):
            _, rgb = self.nerf.apply(
                nerf_params, pts01, jnp.zeros_like(pts01), False
            )
            return rgb

        self._query_fn = _query
        self._rgb_fn = _rgb

        # one-dispatch grid query for the voxelizer (voxelize.py
        # build_packed_grid_query docstring: the per-program remote-dispatch
        # tax made the 64-batch loop cost 35-95 s on the tunnel runtime)
        from pixie_tpu.voxel.voxelize import build_packed_grid_query  # noqa: PLC0415

        def _df(params, pts01):
            nerf_p, feat_p = params
            density = self.nerf.apply(nerf_p, pts01, None, True)
            if self.feat is not None:
                feature = self.feat.apply(feat_p, pts01)
            else:
                feature = jnp.concatenate(
                    [density, jnp.zeros_like(density)], axis=-1)
            return density, feature

        self._packed_grid_fn = build_packed_grid_query(
            _df, lambda params, pts01: self.nerf.apply(
                params[0], pts01, jnp.zeros_like(pts01), False)[1])

    def query_packed_chunks(self, world_points, chunk_size, delta,
                            alpha_weighted=True):
        """Voxelizer fast path: features + packed alpha/rgb for the whole
        grid from one jitted scan (see voxelize.build_packed_grid_query)."""
        return self._packed_grid_fn(
            (self.nerf_params, self.feat_params),
            self._to_nerf01_np(world_points), chunk_size, delta,
            alpha_weighted)

    def _to_nerf01_np(self, world_points: np.ndarray) -> np.ndarray:
        p = np.asarray(world_points, np.float32)
        if self.transform is not None:
            ph = np.concatenate([p, np.ones((len(p), 1), np.float32)], axis=1)
            p = (self.transform @ ph.T).T[:, :3]
        p = p * self.scale
        # fields are parameterized on [0,1]^3 over the [-1,1] box
        return p * 0.5 + 0.5

    def _to_nerf01(self, world_points: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self._to_nerf01_np(world_points))

    def query(self, world_points):
        density, feature = self._query_fn(
            self.nerf_params, self.feat_params, self._to_nerf01(world_points)
        )
        return {"density": density, "feature": feature}

    def get_density(self, world_points):
        return self.query(world_points)["density"]

    def get_alpha(self, world_points, delta: float):
        return 1.0 - jnp.exp(-self.get_density(world_points) * delta)

    def get_rgb(self, world_points):
        return self._rgb_fn(self.nerf_params, self._to_nerf01(world_points))


def load_field_adapter(output_dir: str | Path) -> FieldAdapter:
    """Load a trained field checkpoint (train_field.save_field_checkpoint)
    plus the optional dataparser transform next to it."""
    from pixie_tpu.recon.train_field import load_field_checkpoint  # noqa: PLC0415

    params = load_field_checkpoint(output_dir)
    meta_path = Path(output_dir) / "checkpoints" / "field_meta.json"
    feature_dim, encoding = 768, "mxu"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        feature_dim = meta.get("feature_dim", 768)
        encoding = meta.get("encoding", "mxu")

    scale, transform = 1.0, None
    dp = Path(output_dir) / "dataparser_transforms.json"
    if dp.exists():
        d = json.loads(dp.read_text())
        scale = float(d["scale"])
        transform = np.asarray(d["transform"], np.float32)

    return FieldAdapter(
        params["nerf"], params.get("feat"), feature_dim=feature_dim,
        world_to_nerf_scale=scale, world_to_nerf_transform=transform,
        encoding=encoding,
    )
