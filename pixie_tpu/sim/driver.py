"""Simulation driver: material point cloud -> MPM rollout -> frame exports.

Port of PhysGaussian gs_simulation.py:377-641 redesigned library-first:
  * loads particles from a material PLY (load_point_cloud, gs_simulation.py:108)
    or a 3DGS checkpoint point cloud;
  * opacity filter, optional rotations / sim-area crop, transform2origin +
    shift2center111 into the MPM cube (gs_simulation.py:405-437);
  * material field application (kNN smoothing + auto BCs) and JSON BCs;
  * frame loop: each frame is ONE compiled lax.scan over substeps
    (vs. ~8 kernel launches x 400 substeps with host sync in the reference);
  * per-frame particle PLY export in world coordinates.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from pixie_tpu.sim import material_field as mf
from pixie_tpu.sim import transforms as tf
from pixie_tpu.sim.bc import build_boundary_conditions
from pixie_tpu.sim.params import decode_param_json
from pixie_tpu.sim.solver import MPMSolver
from pixie_tpu.utils.io import load_material_ply, make_material_vertex, write_ply


def run_simulation(
    point_cloud_path: str | Path,
    config_path: str | Path,
    output_dir: str | Path,
    n_frames: int | None = None,
    save_ply: bool = True,
    particle_volume: float | None = None,
    debug: bool = False,
    use_fast_solver: bool = True,
    gaussian_checkpoint: str | Path | None = None,
) -> dict:
    """End-to-end rollout; returns timing/diagnostic info.

    With ``gaussian_checkpoint`` (a 3DGS model dir or point_cloud.ply), the
    simulated particles come from the opacity-filtered gaussians
    (gs_simulation.py:405-434) with optional internal particle filling, and
    the material PLY maps onto them via kNN smoothing — the reference's full
    neural-simulation flow.  Without it, the material PLY's vertices ARE the
    particles (point-cloud mode, gs_simulation.py:108).
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    (material_params, bc_params, time_params, preprocessing_params,
     camera_params) = decode_param_json(config_path)

    params = load_material_ply(point_cloud_path)

    if gaussian_checkpoint is not None:
        pos, extra = load_gaussian_particles(
            gaussian_checkpoint,
            opacity_threshold=preprocessing_params["opacity_threshold"],
            filling=preprocessing_params.get("particle_filling"),
            n_grid=material_params["n_grid"],
        )
    else:
        pos = params["pos"].astype(np.float32)
        extra = {}
    n0 = len(pos)
    logging.info("Loaded %d particles from %s", n0,
                 gaussian_checkpoint or point_cloud_path)

    # optional rotations (gs_simulation.py:413-420)
    rotation_matrices = tf.generate_rotation_matrices(
        preprocessing_params.get("rotation_degree", []) or [],
        preprocessing_params.get("rotation_axis", []) or [],
    )
    pos = tf.apply_rotations(pos, rotation_matrices)

    # sim-area crop (gs_simulation.py:423-434)
    sim_area = preprocessing_params.get("sim_area")
    keep = np.ones(len(pos), bool)
    if sim_area is not None:
        bounds = np.asarray(sim_area, np.float32).reshape(3, 2)
        keep = np.all((pos >= bounds[:, 0]) & (pos <= bounds[:, 1]), axis=1)
        pos = pos[keep]
        logging.info("sim_area crop: %d -> %d particles", n0, len(pos))

    # normalize into the MPM cube (gs_simulation.py:436-437)
    pos_norm, scale_origin, original_mean_pos = tf.transform2origin(pos)
    z_shift = preprocessing_params.get("z_shift_value", 0.0)
    pos_mpm = tf.shift2center111(pos_norm, z_shift)

    n = len(pos_mpm)
    if particle_volume is None:
        # uniform volume estimate from the normalized unit cube
        particle_volume = 1.0 / max(n, 1)
    vols = np.full(n, particle_volume, np.float32)

    solver = MPMSolver()
    solver.load_initial_data(
        pos_mpm, vols,
        n_grid=material_params["n_grid"], grid_lim=material_params["grid_lim"],
    )
    g = material_params["g"]
    if np.isscalar(g):
        g = [0.0, 0.0, -abs(float(g))]
    setup = {k: v for k, v in material_params.items() if k not in ("n_grid", "grid_lim")}
    setup["g"] = g
    solver.set_parameters_dict(setup)

    # material field: kNN map PLY properties onto the (possibly different)
    # particle set; identity when the PLY vertices are the particles
    if gaussian_checkpoint is not None:
        sub_params = dict(params)  # PLY is the material source, not particles
    else:
        sub_params = {
            k: (np.asarray(v)[keep] if np.asarray(v).shape[:1] == (n0,) else v)
            for k, v in params.items()
        }
        sub_params["pos"] = pos  # original-frame positions for kNN
    mpm_world = tf.apply_inverse_rotations(
        tf.undotransform2origin(
            tf.undoshift2center111(pos_mpm, z_shift), scale_origin, original_mean_pos
        ),
        rotation_matrices,
    )
    conf, auto_bcs = mf.apply_material_field_to_simulation(
        solver, sub_params, mpm_positions_world=mpm_world,
        only_handle_largest_cluster=preprocessing_params["only_handle_largest_cluster"],
        fix_ground=preprocessing_params["fix_ground"],
        k_smoothing_neighbors=preprocessing_params["k_smoothing_neighbors"],
        nn_distance_threshold=preprocessing_params["nn_distance_threshold"],
    )

    # JSON boundary conditions (decode_param.py:277-396)
    for bc in build_boundary_conditions(bc_params, time_params, pos_mpm):
        solver.bcs.append(bc)

    if debug:
        (output_dir / "boundary_conditions.json").write_text(
            json.dumps(auto_bcs, indent=2)
        )

    substep_dt = time_params["substep_dt"]
    frame_dt = time_params["frame_dt"]
    frame_num = int(n_frames if n_frames is not None else time_params["frame_num"])
    steps_per_frame = max(int(round(frame_dt / substep_dt)), 1)

    if use_fast_solver:
        from pixie_tpu.sim.solver_fast import FastMPMSolver  # noqa: PLC0415

        fast = FastMPMSolver(solver.state, solver.cfg, tuple(solver.bcs))
        stepper = fast
    else:
        stepper = solver

    ply_dir = output_dir / "ply_files"
    if save_ply:
        ply_dir.mkdir(exist_ok=True)

    frame_times = []
    for frame in range(frame_num):
        t0 = time.time()
        stepper.step_frame(steps_per_frame, substep_dt)
        x_mpm = np.asarray(stepper.state.x)
        frame_times.append(time.time() - t0)

        if save_ply:
            # undo transforms back to world coordinates (gs_simulation.py:591-600)
            x_world = tf.apply_inverse_rotations(
                tf.undotransform2origin(
                    tf.undoshift2center111(x_mpm, z_shift),
                    scale_origin, original_mean_pos,
                ),
                rotation_matrices,
            )
            v = make_material_vertex(
                coords=x_world,
                density=np.asarray(stepper.state.density),
                E=np.asarray(stepper.state.E),
                nu=np.asarray(stepper.state.nu),
                material_id=np.asarray(stepper.state.material),
                conf=conf,
            )
            write_ply(ply_dir / f"frame_{frame:04d}.ply", v)
        if frame % 10 == 0:
            logging.info(
                "frame %d/%d: %.1fms (%d substeps)",
                frame, frame_num, frame_times[-1] * 1e3, steps_per_frame,
            )

    info = {
        "n_particles": n,
        "frames": frame_num,
        "substeps_per_frame": steps_per_frame,
        "median_frame_s": float(np.median(frame_times)) if frame_times else None,
        "substeps_per_sec": (
            steps_per_frame / float(np.median(frame_times)) if frame_times else None
        ),
        "active_materials": list(solver.cfg.active_materials),
        "solver": "pallas-tiled" if use_fast_solver else "xla-reference",
        "auto_bcs": auto_bcs,
    }
    (output_dir / "sim_info.json").write_text(json.dumps(info, indent=2))
    return info


def load_gaussian_particles(gaussian_checkpoint, opacity_threshold: float = 0.02,
                            filling: dict | None = None, n_grid: int = 50):
    """3DGS checkpoint -> simulation particles.

    Opacity filter (gs_simulation.py:405), optional internal particle filling
    (fill_particles, particle_filling/filling.py:291) with attribute
    inheritance, covariances for rendering transport.
    """
    from pixie_tpu.recon.gaussians import (  # noqa: PLC0415
        covariance_upper,
        get_opacity,
        load_gaussian_ply,
    )
    from pixie_tpu.recon.train_gaussians import search_for_max_iteration  # noqa: PLC0415

    path = Path(gaussian_checkpoint)
    if path.is_dir():
        pc_dir = path / "point_cloud"
        it = search_for_max_iteration(pc_dir)
        path = pc_dir / f"iteration_{it}" / "point_cloud.ply"
    gs = load_gaussian_ply(path)

    opacity = np.asarray(get_opacity(gs))[:, 0]
    keep = opacity > opacity_threshold
    pos = np.asarray(gs["xyz"])[keep].astype(np.float32)
    cov = np.asarray(covariance_upper(gs))[keep]
    opac = opacity[keep]
    logging.info("opacity filter: %d -> %d gaussians", len(opacity), len(pos))

    if filling:
        from pixie_tpu.sim.filling import fill_particles  # noqa: PLC0415

        # normalize to [0,1] box for the filling grids (gs_simulation flow
        # fills after transform2origin; approximate with the bbox here)
        lo = pos.min(axis=0)
        span = max(float((pos.max(axis=0) - lo).max()), 1e-6)
        pos01 = (pos - lo) / span
        new01 = fill_particles(
            pos01, opac, cov / span**2,
            grid_n=filling["n_grid"], max_samples=filling["max_particles_num"],
            grid_dx=1.0 / filling["n_grid"],
            density_thres=filling["density_threshold"],
            search_thres=filling["search_threshold"],
            max_particles_per_cell=filling["max_partciels_per_cell"],
            search_exclude_dir=filling["search_exclude_direction"],
            ray_cast_dir=filling["ray_cast_direction"],
            boundary=filling["boundary"],
        )
        if len(new01):
            pos = np.concatenate([pos, (new01 * span + lo).astype(np.float32)])
            logging.info("particle filling added %d particles", len(new01))
    return pos, {"cov_upper": cov, "opacity": opac}
