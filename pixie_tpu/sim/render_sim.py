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

    The payload fields (``shs`` / ``opacity_act`` / ``unselected``) are
    assumed IMMUTABLE for the renderer's lifetime: they are transferred to
    the device once, keyed on (camera, SH degree), so in-place mutation
    after the first frame would silently render stale values.  Construct a
    new SimRenderer to change the payload.
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
    # extra rasterize_tiled kwargs (e.g. max_tiles_side/tile_cap tuning —
    # sim splats are small, so a tighter candidate fan-out shrinks the
    # per-frame 36N-key sort); static per renderer
    raster_opts: dict = field(default_factory=dict, repr=False)
    _static_parts: dict = field(default_factory=dict, repr=False)

    def __setattr__(self, name, value):
        # rebinding the gaussian payload bumps an explicit version used in
        # the render-jit cache key — id()-keying is unsound because CPython
        # reuses the id of a freed array (ADVICE r4)
        if name in ("shs", "opacity_act", "unselected"):
            self.__dict__["_payload_version"] = (
                self.__dict__.get("_payload_version", 0) + 1)
        object.__setattr__(self, name, value)

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

    def _world_maps(self):
        """Fold undoshift2center111 -> undotransform2origin ->
        apply_inverse_rotations (gs_simulation.py:595-600) into one affine
        map pos_w = x @ A + b, and the covariance unscale + un-rotation into
        one packed 6x6 congruence cov6_w = cov6 @ T6.T — so the whole
        MPM->world transform runs on device inside the render program
        instead of as per-frame host numpy."""
        from pixie_tpu.recon.rasterizer import congruence6  # noqa: PLC0415

        q = np.eye(3, dtype=np.float64)
        for r in reversed(self.rotation_matrices):
            q = q @ np.asarray(r, np.float64)
        c = np.array([1.0, 1.0, 1.0 + self.z_shift])
        a_mat = q / self.scale_origin
        b_vec = (np.asarray(self.original_mean_pos, np.float64)
                 - c / self.scale_origin) @ q
        t6 = congruence6(q.T) / (self.scale_origin ** 2)
        return (a_mat.astype(np.float32), b_vec.astype(np.float32),
                t6.astype(np.float32))

    def _make_render_jit(self, cam, degree: int):
        """One jitted program for the whole per-frame compute: MPM->world
        transform, SH colors at the deformed positions, and the tile
        rasterize — inputs are the raw sim-state (x, cov6) slices, so the
        production driver feeds DEVICE arrays straight from the solver with
        zero host round-trip.

        The eager version of this path cost ~15 s/frame on the remote axon
        runtime (eval_sh alone is ~60 elementwise dispatches, each paying
        the tunnel round-trip); the r3 pre-jit measurement was
        14,935.7 ms/frame vs 277 ms jitted (docs/DESIGN.md).  The image
        returns as uint8 (1.9 MB vs 7.7 MB f32 at 800^2 over the tunnel)."""
        from pixie_tpu.recon import gaussians as G  # noqa: PLC0415
        from pixie_tpu.recon.rasterizer import rasterize_tiled  # noqa: PLC0415

        bg = 1.0 if self.white_bg else 0.0
        a_mat, b_vec, t6 = self._world_maps()
        a_dev, b_dev, t6_dev = (jax.device_put(v) for v in (a_mat, b_vec, t6))

        @jax.jit
        def render(shs, opacity, u_pos, u_cov, x_mpm, cov6_mpm, vm):
            pos_w = x_mpm @ a_dev + b_dev
            cov_w = cov6_mpm @ t6_dev.T
            pos_r = jnp.concatenate([pos_w, u_pos], 0)
            cov_r = jnp.concatenate([cov_w, u_cov], 0)
            # camera center in world space (convert_SH, render_utils.py:131)
            cam_pos = -vm[:3, :3].T @ vm[:3, 3]
            dirs = pos_r - cam_pos[None]
            dirs = dirs / jnp.maximum(
                jnp.sqrt(jnp.sum(dirs * dirs, axis=1, keepdims=True)), 1e-8)
            colors = jnp.clip(G.eval_sh(shs, dirs, degree), 0.0, None)
            params = {
                "xyz": pos_r,
                "cov6_precomp": cov_r,
                "colors_precomp": colors,
                "opacity_precomp": opacity[:, 0],
            }
            img, _alpha = rasterize_tiled(params, vm, cam, bg_color=bg,
                                          **self.raster_opts)
            img = jnp.clip(img[: self.height, : self.width], 0.0, 1.0)
            img8 = (img * 255.0 + 0.5).astype(jnp.uint8)
            return img8, pos_w, cov_w

        return render

    def render_frame(self, frame_idx: int, x_mpm_gs, cov6_mpm_gs,
                     fetch: bool = True):
        """Rasterize one simulation frame.

        ``x_mpm_gs`` / ``cov6_mpm_gs`` may be host numpy or device jax
        arrays (the driver passes solver-state slices directly).  Returns
        ((H, W, 3) uint8 frame, (pos_w, cov_w)) — the world-frame pos/cov
        are device arrays fetched lazily (only PLY export pays the
        transfer).

        With ``fetch=False`` the image is returned as a DEVICE uint8 array
        (dispatch only, no host sync): the driver dispatches the next MPM
        frame before fetching, so the ~75 ms tunnel transfer rides behind
        the device's substep work instead of serializing the frame loop."""
        shs = self.shs
        opacity = self.opacity_act
        vm = np.asarray(self.viewmats[frame_idx], np.float32)
        cam = self._camera()
        degree = {1: 0, 4: 1, 9: 2, 16: 3}.get(shs.shape[1], 3)
        # key carries the payload version (bumped by __setattr__ on rebind)
        # so rebinding self.shs/opacity_act/unselected invalidates the
        # device cache; IN-PLACE value mutation of the same arrays is NOT
        # detected (payload is treated as rollout-constant — ADVICE r3/r4)
        key = (cam, degree, self.__dict__.get("_payload_version", 0),
               shs.shape[0])
        if self._static_parts.get("render_key") != key:
            self._static_parts["render_key"] = key
            self._static_parts["render_jit"] = self._make_render_jit(cam, degree)
            # gaussian payload is rollout-constant: transfer it once
            if self.unselected is not None:
                shs = np.concatenate([shs, self.unselected["shs"]], 0)
                opacity = np.concatenate(
                    [opacity, self.unselected["opacity"].reshape(-1, 1)], 0)
                u_pos = np.asarray(self.unselected["pos"], np.float32)
                u_cov = np.asarray(self.unselected["cov6"], np.float32)
            else:
                u_pos = np.zeros((0, 3), np.float32)
                u_cov = np.zeros((0, 6), np.float32)
            self._static_parts["shs_dev"] = jax.device_put(
                np.asarray(shs, np.float32))
            self._static_parts["opacity_dev"] = jax.device_put(
                np.asarray(opacity, np.float32))
            self._static_parts["u_pos_dev"] = jax.device_put(u_pos)
            self._static_parts["u_cov_dev"] = jax.device_put(u_cov)
        sp = self._static_parts
        img8, pos_w, cov_w = sp["render_jit"](
            sp["shs_dev"], sp["opacity_dev"], sp["u_pos_dev"], sp["u_cov_dev"],
            jnp.asarray(x_mpm_gs, jnp.float32),
            jnp.asarray(cov6_mpm_gs, jnp.float32), jnp.asarray(vm))
        return (np.asarray(img8) if fetch else img8), (pos_w, cov_w)

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


def save_frame_png(path: str | Path, img: np.ndarray):
    """Write a frame as PNG (cv2.imwrite equivalent, gs_simulation.py:629-631).
    Accepts uint8 (render_frame output) or [0,1] float."""
    from PIL import Image  # noqa: PLC0415

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)
    logging.debug("wrote %s", path)
