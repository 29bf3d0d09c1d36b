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


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> int:
    """Multi-host init — the TPU-native replacement for the reference's
    ``ddp_setup`` (pixie/training_utils.py:50-55: init_process_group(nccl) +
    mp.spawn one proc/GPU).  On TPU pods each host runs ONE process; this
    wires them into a single JAX runtime so ``jax.devices()`` spans the pod.

    Args may be given explicitly (mirroring init_process_group's
    master_addr/world_size/rank) or picked up from the standard JAX env /
    TPU metadata automatically by ``jax.distributed.initialize()``.
    No-op when already initialized or clearly single-host.
    Returns the process count after initialization.
    """
    import os  # noqa: PLC0415

    try:
        if jax.process_count() > 1:
            return jax.process_count()  # already initialized
    except RuntimeError:
        pass
    explicit = coordinator_address is not None
    env_driven = any(
        k in os.environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
    )
    if explicit or env_driven:
        from jax._src import xla_bridge  # noqa: PLC0415

        if xla_bridge.backends_are_initialized():
            # too late to join a pod in this process (jax.distributed must
            # run before first backend touch); single-host fallback.
            # Common cause: stray TPU_* env vars on a single-chip host.
            import logging  # noqa: PLC0415

            logging.debug("initialize_distributed: backend already up; "
                          "continuing single-host")
            return 1
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
        )
    n = jax.process_count()
    if n > 1:
        import logging  # noqa: PLC0415

        logging.info(
            "distributed: process %d/%d, %d local + %d global devices",
            jax.process_index(), n, jax.local_device_count(),
            jax.device_count(),
        )
    return n


def get_pod_mesh(dp: int | None = None, sp: int = 1) -> Mesh:
    """Multi-host-aware mesh: on a pod (process_count > 1) lay the dp axis
    across hosts first so its collectives ride DCN-adjacent boundaries only
    for the gradient psum while sp stays inside each host's ICI domain
    (scaling-book recipe: put the fastest-varying sharded axis on ICI).
    Single-host: identical to get_mesh."""
    if jax.process_count() == 1:
        return get_mesh(dp=dp, sp=sp)
    from jax.experimental import mesh_utils  # noqa: PLC0415

    n = jax.device_count()
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != n_devices({n})"
    arr = mesh_utils.create_device_mesh(
        (dp, sp), allow_split_physical_axes=True
    )
    return Mesh(arr, axis_names=("dp", "sp"))


def host_local_to_global(mesh: Mesh, tree, axis: str = "dp"):
    """Assemble per-host batch shards into one global array (multi-host;
    replaces DistributedSampler's rank-local split).  Single-host: same as
    shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(mesh, tree, axis)
    from jax.experimental import multihost_utils  # noqa: PLC0415

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return multihost_utils.host_local_array_to_global_array(
            x, mesh, spec
        )

    return jax.tree.map(put, tree)
