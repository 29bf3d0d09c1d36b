"""Particle state export/import (engine_utils.py:10-47 equivalents).

h5 snapshots (x + particle_volume in the reference's transposed layout,
consumed by MPM_Simulator_WARP.load_from_sampling, mpm_solver_warp.py:183)
and simple position PLYs per frame.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pixie_tpu.utils.io import write_ply


def save_particles_h5(path: str | Path, x: np.ndarray, particle_volume: np.ndarray):
    """Reference layout: x stored transposed (3, N), volume (1, N)."""
    import h5py  # noqa: PLC0415

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("x", data=np.asarray(x, np.float64).T)
        f.create_dataset(
            "particle_volume", data=np.asarray(particle_volume, np.float64)[None]
        )


def load_particles_h5(path: str | Path):
    import h5py  # noqa: PLC0415

    with h5py.File(path, "r") as f:
        x = np.asarray(f["x"]).T.astype(np.float32)
        vol = np.squeeze(np.asarray(f["particle_volume"]), 0).astype(np.float32)
    return x, vol


def save_positions_ply(path: str | Path, x: np.ndarray, colors: np.ndarray | None = None):
    x = np.asarray(x, np.float32)
    if colors is None:
        v = np.zeros(len(x), dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
    else:
        v = np.zeros(len(x), dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                    ("red", "u1"), ("green", "u1"), ("blue", "u1")])
        v["red"], v["green"], v["blue"] = np.asarray(colors, np.uint8).T
    v["x"], v["y"], v["z"] = x.T
    write_ply(path, v)
