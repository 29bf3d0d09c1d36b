"""GS-rendered simulation frames: the reference's flagship output path.

Rebuild of the render half of the PhysGaussian frame loop
(gs_simulation.py:573-631) and its gaussian-format per-frame PLY export
(gs_simulation.py:290-330, export_gaussians_to_ply) on the TPU tile
rasterizer:

  * per frame, simulated particle positions are undone back to world
    coordinates and the F-transported covariances are unscaled
    (cov / scale_origin**2) and un-rotated (apply_inverse_cov_rotations)
    — gs_simulation.py:595-600;
  * crop-excluded gaussians (``sim_area``) are appended as static splats
    (gs_simulation.py:602-608);
  * view-dependent colors come from SH evaluated at the *deformed* world
    positions (convert_SH, utils/render_utils.py:123-141), and the frame is
    rasterized through ``rasterize_tiled`` with the precomputed
    covariance/color/opacity inputs — the same contract the reference's
    CUDA rasterizer exposes (cov3D_precomp / colors_precomp);
  * per-frame gaussian PLYs carry eigendecomposed covariances as
    log-scales + wxyz quaternions (cov3D_to_log_scales_and_quats,
    gs_simulation.py:244-268) so ``blender/render_gs.py`` renders sim
    output directly.  NOTE the reference writes the *activated* (sigmoid)
    opacity into the PLY's raw ``opacity`` field (gs_simulation.py:316
    stores ``opacity_render`` = ``pc.get_opacity``); we reproduce that
    quirk for byte-level downstream compatibility.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from pixie_tpu.sim import camera as cam_utils
from pixie_tpu.sim import transforms as tf


def cov6_to_log_scales_quats(cov6: np.ndarray):
    """Upper-packed world covariances -> (log_scales (N,3), quats wxyz (N,4)).

    Eigendecomposition with descending eigenvalues and right-handedness
    enforcement (cov3D_to_log_scales_and_quats, gs_simulation.py:230-268).
    Host-side numpy: batched 3x3 eigh is cheap next to the rasterize.
    """
    cov6 = np.asarray(cov6, np.float64)
    m = np.zeros((len(cov6), 3, 3))
    m[:, 0, 0] = cov6[:, 0]
    m[:, 0, 1] = m[:, 1, 0] = cov6[:, 1]
    m[:, 0, 2] = m[:, 2, 0] = cov6[:, 2]
    m[:, 1, 1] = cov6[:, 3]
    m[:, 1, 2] = m[:, 2, 1] = cov6[:, 4]
    m[:, 2, 2] = cov6[:, 5]
    evals, evecs = np.linalg.eigh(m)            # ascending
    evals, evecs = evals[:, ::-1], evecs[:, :, ::-1]  # descending
    scales = np.sqrt(np.clip(evals, 1e-12, None))
    neg = np.linalg.det(evecs) < 0
    evecs[neg, :, 2] *= -1.0

    # rotation matrix -> wxyz quaternion (branchless Shepperd)
    r = evecs
    t = np.trace(r, axis1=1, axis2=2)
    q = np.zeros((len(r), 4))
    # case trace > 0
    s0 = np.sqrt(np.clip(t + 1.0, 1e-12, None)) * 2
    q0 = np.stack([0.25 * s0,
                   (r[:, 2, 1] - r[:, 1, 2]) / s0,
                   (r[:, 0, 2] - r[:, 2, 0]) / s0,
                   (r[:, 1, 0] - r[:, 0, 1]) / s0], -1)
    # diagonal-dominant cases
    sx = np.sqrt(np.clip(1.0 + r[:, 0, 0] - r[:, 1, 1] - r[:, 2, 2], 1e-12, None)) * 2
    qx = np.stack([(r[:, 2, 1] - r[:, 1, 2]) / sx, 0.25 * sx,
                   (r[:, 0, 1] + r[:, 1, 0]) / sx,
                   (r[:, 0, 2] + r[:, 2, 0]) / sx], -1)
    sy = np.sqrt(np.clip(1.0 - r[:, 0, 0] + r[:, 1, 1] - r[:, 2, 2], 1e-12, None)) * 2
    qy = np.stack([(r[:, 0, 2] - r[:, 2, 0]) / sy,
                   (r[:, 0, 1] + r[:, 1, 0]) / sy, 0.25 * sy,
                   (r[:, 1, 2] + r[:, 2, 1]) / sy], -1)
    sz = np.sqrt(np.clip(1.0 - r[:, 0, 0] - r[:, 1, 1] + r[:, 2, 2], 1e-12, None)) * 2
    qz = np.stack([(r[:, 1, 0] - r[:, 0, 1]) / sz,
                   (r[:, 0, 2] + r[:, 2, 0]) / sz,
                   (r[:, 1, 2] + r[:, 2, 1]) / sz, 0.25 * sz], -1)
    use_x = (r[:, 0, 0] >= r[:, 1, 1]) & (r[:, 0, 0] >= r[:, 2, 2])
    use_y = (~use_x) & (r[:, 1, 1] >= r[:, 2, 2])
    q = np.where(use_x[:, None], qx, np.where(use_y[:, None], qy, qz))
    q = np.where((t > 0)[:, None], q0, q)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return np.log(scales).astype(np.float32), q.astype(np.float32)


@dataclass
class SimRenderer:
    """Per-frame splat rendering of a running simulation.

    Built once per rollout from the gaussian payload collected during
    particle setup; ``render_frame`` takes the current MPM-frame positions
    and covariances of the first ``gs_num`` particles (the real gaussians,
    not filled particles) and returns an (H, W, 3) uint8 frame.
    """

    shs: np.ndarray                 # (G, K, 3) SH coefficients
    opacity_act: np.ndarray         # (G, 1) activated (sigmoid) opacity
    scale_origin: float
    original_mean_pos: np.ndarray
    rotation_matrices: list
    z_shift: float
    viewmats: list                  # per-frame (4,4) world->camera
    width: int
    height: int
    fovx: float
    fovy: float
    white_bg: bool = False
    unselected: dict | None = None  # pos/cov6/opacity/shs in world frame
    _static_parts: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_camera_params(cls, camera_params: dict, model_path,
                           n_frames: int, shs, opacity_act, scale_origin,
                           original_mean_pos, rotation_matrices, z_shift,
                           unselected=None, white_bg=False):
        """Reference camera setup (gs_simulation.py:536-590): MPM-space
        viewpoint center/up -> world orbit basis -> per-frame views."""
        center_w, obs = cam_utils.get_center_view_worldspace_and_observant_coordinate(
            camera_params.get("mpm_space_viewpoint_center", [1.0, 1.0, 1.0]),
            camera_params.get("mpm_space_vertical_upward_axis", [0.0, 0.0, 1.0]),
            rotation_matrices, scale_origin, np.asarray(original_mean_pos),
        )
        viewmats, h, w, fovx, fovy = cam_utils.get_sim_camera_sequence(
            camera_params, model_path, center_w, obs, n_frames,
        )
        return cls(
            shs=np.asarray(shs, np.float32),
            opacity_act=np.asarray(opacity_act, np.float32).reshape(-1, 1),
            scale_origin=float(scale_origin),
            original_mean_pos=np.asarray(original_mean_pos, np.float32),
            rotation_matrices=list(rotation_matrices),
            z_shift=float(z_shift),
            viewmats=viewmats, width=w, height=h, fovx=fovx, fovy=fovy,
            unselected=unselected, white_bg=white_bg,
        )

    # --- geometry helpers -------------------------------------------------

    def to_world(self, x_mpm: np.ndarray) -> np.ndarray:
        """MPM cube -> original world coordinates (gs_simulation.py:595-599)."""
        return tf.apply_inverse_rotations(
            tf.undotransform2origin(
                tf.undoshift2center111(np.asarray(x_mpm), self.z_shift),
                self.scale_origin, self.original_mean_pos,
            ),
            self.rotation_matrices,
        )

    def cov_to_world(self, cov6_mpm: np.ndarray) -> np.ndarray:
        """MPM-frame covariances -> world (gs_simulation.py:600)."""
        return tf.apply_inverse_cov_rotations(
            np.asarray(cov6_mpm) / (self.scale_origin ** 2),
            self.rotation_matrices,
        )

    # --- rendering --------------------------------------------------------

    def _camera(self):
        from pixie_tpu.recon.rasterizer import Camera  # noqa: PLC0415

        # rasterize_tiled needs H, W multiples of the 16px tile; render at
        # the padded resolution and crop (principal point stays centered on
        # the REQUESTED frame so the crop is exact)
        hp = (self.height + 15) // 16 * 16
        wp = (self.width + 15) // 16 * 16
        fx = self.width / (2.0 * np.tan(self.fovx * 0.5))
        fy = self.height / (2.0 * np.tan(self.fovy * 0.5))
        return Camera(width=wp, height=hp, fx=fx, fy=fy,
                      cx=self.width / 2.0, cy=self.height / 2.0)

    def _make_render_jit(self, cam, degree: int):
        """One jitted program for the whole per-frame compute: SH colors at
        the deformed positions, covariance assembly, and the tile rasterize.

        The eager version of this path cost ~15 s/frame on the remote axon
        runtime — eval_sh alone is ~60 elementwise dispatches, each paying
        the tunnel round-trip — versus one dispatch + ~5 MB of input
        transfer here (docs/DESIGN.md "Benchmarking traps")."""
        from pixie_tpu.recon import gaussians as G  # noqa: PLC0415
        from pixie_tpu.recon.rasterizer import rasterize_tiled  # noqa: PLC0415

        bg = 1.0 if self.white_bg else 0.0

        @jax.jit
        def render(shs, opacity, pos_r, cov_r, vm):
            # camera center in world space (convert_SH, render_utils.py:131)
            cam_pos = -vm[:3, :3].T @ vm[:3, 3]
            dirs = pos_r - cam_pos[None]
            dirs = dirs / jnp.maximum(
                jnp.sqrt(jnp.sum(dirs * dirs, axis=1, keepdims=True)), 1e-8)
            colors = jnp.clip(G.eval_sh(shs, dirs, degree), 0.0, None)
            # upper-packed cov6 -> full (N, 3, 3) for the precomp path
            c = cov_r
            cov_mat = jnp.stack([
                jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
                jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
                jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
            ], 1)
            params = {
                "xyz": pos_r,
                "cov3d_precomp": cov_mat,
                "colors_precomp": colors,
                "opacity_precomp": opacity[:, 0],
            }
            img, _alpha = rasterize_tiled(params, vm, cam, bg_color=bg)
            return jnp.clip(img[: self.height, : self.width], 0.0, 1.0)

        return render

    def render_frame(self, frame_idx: int, x_mpm_gs, cov6_mpm_gs):
        """Rasterize one simulation frame; returns (H, W, 3) float32 in
        [0, 1] plus the world-frame (pos, cov6) used (for PLY export)."""
        pos_w = self.to_world(x_mpm_gs).astype(np.float32)
        cov_w = self.cov_to_world(cov6_mpm_gs).astype(np.float32)
        opacity = self.opacity_act
        shs = self.shs
        if self.unselected is not None:
            pos_r = np.concatenate([pos_w, self.unselected["pos"]], 0)
            cov_r = np.concatenate([cov_w, self.unselected["cov6"]], 0)
            opacity = np.concatenate(
                [opacity, self.unselected["opacity"].reshape(-1, 1)], 0)
            shs = np.concatenate([shs, self.unselected["shs"]], 0)
        else:
            pos_r, cov_r = pos_w, cov_w

        vm = np.asarray(self.viewmats[frame_idx], np.float32)
        cam = self._camera()
        degree = {1: 0, 4: 1, 9: 2, 16: 3}.get(shs.shape[1], 3)
        key = (cam, degree)
        if self._static_parts.get("render_key") != key:
            self._static_parts["render_key"] = key
            self._static_parts["render_jit"] = self._make_render_jit(cam, degree)
            # gaussian payload is rollout-constant: transfer it once
            self._static_parts["shs_dev"] = jax.device_put(shs)
            self._static_parts["opacity_dev"] = jax.device_put(
                opacity.astype(np.float32))
        img = self._static_parts["render_jit"](
            self._static_parts["shs_dev"], self._static_parts["opacity_dev"],
            jnp.asarray(pos_r), jnp.asarray(cov_r), jnp.asarray(vm))
        return np.asarray(jax.device_get(img)), (pos_w, cov_w)

    def export_gaussian_ply(self, path, pos_world, cov6_world):
        """Per-frame gaussian-format PLY (export_gaussians_to_ply,
        gs_simulation.py:290-330) for the Blender GS render mode."""
        from pixie_tpu.recon.gaussians import save_gaussian_ply  # noqa: PLC0415

        log_s, quat = cov6_to_log_scales_quats(cov6_world)
        save_gaussian_ply(path, {
            "xyz": np.asarray(pos_world, np.float32),
            "f_dc": self.shs[:, :1, :],
            "f_rest": self.shs[:, 1:, :],
            # reference quirk: activated opacity in the raw field (see
            # module docstring)
            "opacity": self.opacity_act,
            "scaling": log_s,
            "rotation": quat,
        })


def save_frame_png(path: str | Path, img01: np.ndarray):
    """Write an [0,1] float image as PNG (cv2.imwrite equivalent,
    gs_simulation.py:629-631)."""
    from PIL import Image  # noqa: PLC0415

    Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(path)
    logging.debug("wrote %s", path)
