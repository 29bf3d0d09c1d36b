"""Orbit-camera controls for simulation rendering.

Port of PhysGaussian utils/camera_view_utils.py (268 lines): spherical-orbit
camera around the MPM-space viewpoint center with per-frame azimuth /
elevation / radius / roll deltas (decode_param camera_params contract,
decode_param.py:213-273), producing world-space view matrices compatible
with the gaussian rasterizer.
"""

from __future__ import annotations

import numpy as np


def generate_local_coord(vertical_axis: np.ndarray):
    """Orthonormal (vertical, h1, h2) frame from a world vertical axis
    (camera_view_utils generate_local_coord)."""
    v = np.asarray(vertical_axis, np.float64)
    v = v / np.linalg.norm(v)
    h1 = np.array([1.0, 1.0, 1.0])
    if abs(np.dot(h1, v)) > 0.99:
        h1 = np.array([0.72, 0.37, -0.67])
    h1 = h1 - np.dot(h1, v) * v
    h1 /= np.linalg.norm(h1)
    h2 = np.cross(v, h1)
    return v, h1, h2


def orbit_camera_position(center, observant_coordinates, azimuth_deg, elevation_deg,
                          radius):
    """Camera position on the orbit sphere in world space."""
    a = np.radians(azimuth_deg)
    e = np.radians(elevation_deg)
    h1, h2, vertical = (
        observant_coordinates[:, 0], observant_coordinates[:, 1],
        observant_coordinates[:, 2],
    )
    offset = radius * (
        np.cos(e) * (np.cos(a) * h1 + np.sin(a) * h2) + np.sin(e) * vertical
    )
    return np.asarray(center) + offset


def look_at_viewmat(cam_pos, target, up, roll_deg: float = 0.0) -> np.ndarray:
    """World->camera matrix, camera looking down +z (rasterizer convention)."""
    cam_pos = np.asarray(cam_pos, np.float64)
    fwd = np.asarray(target, np.float64) - cam_pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    if roll_deg:
        r = np.radians(roll_deg)
        right, dn = (
            np.cos(r) * right + np.sin(r) * dn,
            -np.sin(r) * right + np.cos(r) * dn,
        )
    rot = np.stack([right, dn, fwd], axis=0)
    t = -rot @ cam_pos
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = rot.astype(np.float32)
    view[:3, 3] = t.astype(np.float32)
    return view


def get_camera_view_sequence(camera_params: dict, viewpoint_center_worldspace,
                             observant_coordinates, n_frames: int):
    """Per-frame view matrices from the sim JSON camera params
    (get_camera_view, camera_view_utils; decode_param.py:213-273 defaults)."""
    az = camera_params.get("init_azimuthm") or 0.0
    el = camera_params.get("init_elevation") or 30.0
    ra = camera_params.get("init_radius") or 2.0
    roll = camera_params.get("init_roll") or 0.0
    da = camera_params.get("delta_a") or 0.0
    de = camera_params.get("delta_e") or 0.0
    dr = camera_params.get("delta_r") or 0.0
    droll = camera_params.get("delta_roll") or 0.0
    move = bool(camera_params.get("move_camera", False))

    vertical = observant_coordinates[:, 2]
    views = []
    for f in range(n_frames):
        if move:
            a, e, r, ro = az + da * f, el + de * f, ra + dr * f, roll + droll * f
        else:
            a, e, r, ro = az, el, ra, roll
        pos = orbit_camera_position(
            viewpoint_center_worldspace, observant_coordinates, a, e, r
        )
        views.append(
            look_at_viewmat(pos, viewpoint_center_worldspace, vertical, ro)
        )
    return views
