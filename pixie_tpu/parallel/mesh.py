"""Device-mesh helpers: the TPU-native replacement for torch DDP/NCCL.

The reference's only parallelism is single-node DDP over local GPUs
(pixie/training_utils.py:50-55 ``ddp_setup`` with nccl, DistributedSampler,
gradient allreduce inside DDP).  On TPU all of that collapses into:

  * one ``jax.sharding.Mesh`` over the chips (ICI; add a 'dcn' axis for
    multi-slice),
  * batch sharded over the 'dp' axis via NamedSharding — jit inserts the
    gradient psum automatically,
  * metric reduction via the same compiled program (no dist.all_reduce),
  * host-object gather via jax.experimental.multihost_utils when multi-host.

Mesh axes used across the package:
  dp — data parallel (batch dim of U-Net training/inference)
  sp — spatial/particle sharding (MPM particles, voxel grids)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(dp: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh. Defaults to all devices on the dp axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a pytree of host arrays with the leading dim sharded over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def initialize_distributed():
    """Multi-host init (replaces dist.init_process_group; no-op single-host)."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    if "JAX_COORDINATOR_ADDRESS" in __import__("os").environ:
        jax.distributed.initialize()
