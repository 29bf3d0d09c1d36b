"""Multiresolution hash-grid encoding in JAX.

TPU-native replacement for tiny-cuda-nn's HashGrid used by the reference's
feature field (f3rm/feature_field.py:32-39: 12 levels, 8 features/level,
2^19 table, base res 16 -> max res 128) and by Nerfacto's density field.

Instant-NGP hashing (Mueller et al. 2022): spatial hash
h(x) = xor_i(x_i * pi_i) mod T with primes (1, 2654435761, 805459861);
levels below the dense-resolution threshold index directly.  Trilinear
interpolation of 8 corners per level; features concatenated across levels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 12
    features_per_level: int = 8
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 128

    @property
    def growth(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / (self.n_levels - 1)
            )
        )

    @property
    def resolutions(self) -> tuple[int, ...]:
        return tuple(
            int(np.floor(self.base_resolution * self.growth**l))
            for l in range(self.n_levels)
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.features_per_level


def _hash_corners(cells: jnp.ndarray, table_size: int, res: int) -> jnp.ndarray:
    """(..., 3) int32 corner coords -> table indices."""
    dense = (res + 1) ** 3
    if dense <= table_size:
        # dense indexing for coarse levels (tcnn behavior)
        return (
            cells[..., 0] * (res + 1) * (res + 1)
            + cells[..., 1] * (res + 1)
            + cells[..., 2]
        )
    c = cells.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return jnp.remainder(h, jnp.uint32(table_size)).astype(jnp.int32)


class HashGridEncoding(nn.Module):
    """Trilinearly-interpolated multiresolution hash encoding.

    Input: (..., 3) in [0, 1]; output (..., n_levels * features_per_level).
    """

    config: HashGridConfig = HashGridConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        table = self.param(
            "table",
            nn.initializers.uniform(scale=2e-4),  # tcnn init: U(-1e-4, 1e-4)
            (cfg.n_levels, 2**cfg.log2_table_size, cfg.features_per_level),
        )
        table = table - 1e-4  # shift uniform(0,2e-4) to (-1e-4, 1e-4)

        batch_shape = x.shape[:-1]
        pts = x.reshape(-1, 3)

        outs = []
        for level, res in enumerate(cfg.resolutions):
            scaled = pts * res
            floor = jnp.floor(scaled)
            frac = scaled - floor
            floor_i = floor.astype(jnp.int32)

            level_feats = jnp.zeros(
                (pts.shape[0], cfg.features_per_level), table.dtype
            )
            for corner in range(8):
                offset = jnp.array(
                    [(corner >> 2) & 1, (corner >> 1) & 1, corner & 1], jnp.int32
                )
                cell = jnp.clip(floor_i + offset, 0, res)
                idx = _hash_corners(cell, 2**cfg.log2_table_size, res)
                w = jnp.prod(
                    jnp.where(offset[None, :] == 1, frac, 1.0 - frac), axis=-1
                )
                level_feats = level_feats + w[:, None] * table[level, idx]
            outs.append(level_feats)

        return jnp.concatenate(outs, axis=-1).reshape(*batch_shape, cfg.out_dim)


def frequency_encoding(x: jnp.ndarray, n_frequencies: int = 6) -> jnp.ndarray:
    """NeRF positional encoding: [sin(2^k pi x), cos(2^k pi x)]_k (per dim)."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype) * jnp.pi
    ang = x[..., None] * freqs  # (..., d, F)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_frequencies)


def sh_encoding(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis up to given degree (tcnn 'SH' dir enc)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        comps += [-0.48860251190291987 * y, 0.48860251190291987 * z,
                  -0.48860251190291987 * x]
    if degree > 2:
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (2.0 * zz - xx - yy),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if degree > 3:
        comps += [
            0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    return jnp.stack(comps, axis=-1)
