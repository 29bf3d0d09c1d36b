"""pixie_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the PIXIE pipeline.

PIXIE ("Physics from Pixels") turns multi-view images of an object into a
simulatable physical object: a distilled CLIP feature field is sampled into a
dense 64^3 feature voxel grid, 3D U-Nets map the grid to per-voxel material
properties (class, density, Young's modulus E, Poisson ratio nu), and an
MLS-MPM solver simulates the object with those per-particle materials.

This package re-designs that stack TPU-first:
  * ``pixie_tpu.sim``      — MLS-MPM solver as pure-functional JAX + Pallas
                             (reference: PhysGaussian mpm_solver_warp/, Warp CUDA kernels)
  * ``pixie_tpu.models``   — 3D U-Nets in flax.linen + torch checkpoint converter
                             (reference: Wavelet-Generation models/module/diffusion_network.py)
  * ``pixie_tpu.voxel``    — voxelizer / segmentation / prediction mapping
                             (reference: pixie/voxel/)
  * ``pixie_tpu.parallel`` — device-mesh sharding helpers (DP training,
                             particle-sharded simulation) replacing torch DDP/NCCL
  * ``pixie_tpu.utils``    — artifact I/O (npy/npz/PLY), normalization, metrics
  * ``pixie_tpu.config``   — configuration tree mirroring the reference's hydra groups
"""

__version__ = "0.1.0"
