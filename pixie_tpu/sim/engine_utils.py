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


def save_rollout_checkpoint(path: str | Path, state, sim_time: float,
                            next_frame: int):
    """Snapshot the FULL MPMState + sim clock as one npz.

    Makes long rollouts resumable — a capability the reference lacks (its
    engine_utils.py:10-47 exports x/volume h5 and position PLYs only;
    SURVEY.md section 5: "MPM rollout state is not checkpointable").  The
    write is atomic (tmp + rename) so a kill mid-save leaves the previous
    checkpoint intact.
    """
    import dataclasses  # noqa: PLC0415

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrs = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, _sim_time=np.float64(sim_time),
                        _next_frame=np.int64(next_frame), **arrs)
    tmp.replace(path)


def load_rollout_checkpoint(path: str | Path):
    """Inverse of save_rollout_checkpoint -> (MPMState, sim_time, next_frame)."""
    import dataclasses  # noqa: PLC0415

    import jax.numpy as jnp  # noqa: PLC0415

    from pixie_tpu.sim.types import MPMState  # noqa: PLC0415

    with np.load(Path(path)) as z:
        fields = {
            f.name: jnp.asarray(z[f.name])
            for f in dataclasses.fields(MPMState)
            if f.name in z
        }
        sim_time = float(z["_sim_time"])
        next_frame = int(z["_next_frame"])
    return MPMState(**fields), sim_time, next_frame
