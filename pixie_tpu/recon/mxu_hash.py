"""MXU-native multiresolution hash encoding (gather-free, scatter-free).

The tcnn-style hash encoding (recon/hashgrid.py, reference
f3rm/feature_field.py:32-39) is a gather of 8 corner rows per level per
point.  On this TPU gathers serialize (~16.5 ns/row, docs/DESIGN.md): a
64^3 voxel query costs ~1 s and a 4096-ray field train step ~10.5 s —
dominated by the table gathers (fwd) and table scatter-adds (bwd).

This module re-expresses the lookup as dense MXU contractions.  Split the
table index ``idx = hi * LO + lo`` and store the level table as
``tab[lo, hi, f]``.  Then a corner lookup is

    m[b, hi, f] = sum_lo  onehot(lo_b)[lo] * tab[lo, hi, f]     (MXU dot)
    out[b, f]   = sum_hi  onehot(hi_b)[hi] * m[b, hi, f]        (VPU reduce)

with the trilinear corner weight folded into the lo one-hot.  Both stages
are dense ops, so the BACKWARD pass is transpose matmuls — no scatter.
The price is table capacity: the dot's FLOPs scale with LO*HI = T, so T
is 2^12..2^13 instead of tcnn's 2^19.  NGP degrades gracefully with
table size (Mueller et al. 2022, Tab. 1), and the pipeline's assets are
single objects; quality is validated by the PSNR tests (tests/test_recon.py).

Levels whose dense size (res+1)^3 fits in T index directly (no hash), as
tcnn does; finer levels use the NGP xor-prime hash mod T.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class MXUHashConfig:
    n_levels: int = 12
    features_per_level: int = 8
    lo: int = 64            # contracted one-hot width (MXU K dim)
    hi: int = 64            # selected one-hot width (VPU reduce dim)
    base_resolution: int = 16
    max_resolution: int = 128
    bf16_dots: bool = True  # bf16 operands, fp32 accumulation

    @property
    def table_size(self) -> int:
        return self.lo * self.hi

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


def _corner_index(cell: jnp.ndarray, table_size: int, res: int) -> jnp.ndarray:
    """(B, 3) int32 corner -> table index in [0, table_size)."""
    dense = (res + 1) ** 3
    if dense <= table_size:
        return (
            cell[:, 0] * (res + 1) * (res + 1)
            + cell[:, 1] * (res + 1)
            + cell[:, 2]
        )
    c = cell.astype(jnp.uint32)
    h = c[:, 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[:, 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[:, 2] * jnp.uint32(_PRIMES[2]))
    return jnp.remainder(h, jnp.uint32(table_size)).astype(jnp.int32)


def encode_points(pts: jnp.ndarray, table: jnp.ndarray, cfg: MXUHashConfig):
    """(B, 3) in [0,1] x (L, LO, HI, F) table -> (B, L*F) features."""
    b = pts.shape[0]
    dt = jnp.bfloat16 if cfg.bf16_dots else jnp.float32
    # bf16 one-hot select stage: exact (one-hot weights are representable
    # in bf16) but measured no-win-to-regression in the r5e A/B
    # (docs/tpu_logs/r5e_queue.log; all-off 250.4 ms is the record), so
    # default off.
    _SELECT_BF16 = (cfg.bf16_dots
                    and os.environ.get("PIXIE_SELECT_BF16", "0") == "1")
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.lo), 1)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.hi), 1)

    outs = []
    for level, res in enumerate(cfg.resolutions):
        tab = table[level].reshape(cfg.lo, cfg.hi * cfg.features_per_level)
        scaled = pts * res
        floor = jnp.floor(scaled)
        frac = scaled - floor
        floor_i = floor.astype(jnp.int32)

        acc = jnp.zeros((b, cfg.features_per_level), jnp.float32)
        for corner in range(8):
            offset = jnp.array(
                [(corner >> 2) & 1, (corner >> 1) & 1, corner & 1], jnp.int32
            )
            cell = jnp.clip(floor_i + offset, 0, res)
            idx = _corner_index(cell, cfg.table_size, res)
            w = jnp.prod(
                jnp.where(offset[None, :] == 1, frac, 1.0 - frac), axis=-1
            )
            lo = jnp.remainder(idx, cfg.lo)
            hi = idx // cfg.lo
            # trilinear weight folded into the contracted one-hot
            oh_lo = jnp.where(iota_lo == lo[:, None], w[:, None], 0.0)
            m = jax.lax.dot_general(
                oh_lo.astype(dt), tab.astype(dt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, cfg.hi, cfg.features_per_level)
            # select stage in the dot dtype: oh_hi is exactly 0/1 in
            # bf16 and the selected feature feeds bf16 MLP dots anyway,
            # so bf16 here halves the (B, HI, F) intermediate's HBM
            # traffic (the encode is HBM-bound, r5b profile) at no
            # effective precision cost; f32-accumulated.  Env gate for
            # on-TPU step-time A/B attribution (bench_recon_train.py).
            if _SELECT_BF16:
                oh_hi = (iota_hi == hi[:, None]).astype(dt)
                acc = acc + jnp.einsum(
                    "bh,bhf->bf", oh_hi, m.astype(dt),
                    preferred_element_type=jnp.float32)
            else:
                oh_hi = (iota_hi == hi[:, None]).astype(jnp.float32)
                acc = acc + jnp.einsum("bh,bhf->bf", oh_hi, m)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


class MXUHashEncoding(nn.Module):
    """Drop-in HashGridEncoding replacement running on the MXU.

    Input (..., 3) in [0, 1] -> (..., n_levels * features_per_level).
    Large batches are processed in 64k-point chunks to bound the
    (B, HI*F) stage-one intermediate.
    """

    config: MXUHashConfig = MXUHashConfig()
    chunk: int = 65536

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        table = self.param(
            "table",
            nn.initializers.uniform(scale=2e-4),  # tcnn init: U(-1e-4, 1e-4)
            (cfg.n_levels, cfg.lo, cfg.hi, cfg.features_per_level),
        )
        table = table - 1e-4

        batch_shape = x.shape[:-1]
        pts = x.reshape(-1, 3)
        n = pts.shape[0]

        # remat: the one-hot stage intermediates are (B, LO/HI)-sized per
        # corner per level — saving them for backward is tens of GB at
        # training batch sizes, recomputing them is a few cheap VPU passes.
        enc = jax.checkpoint(lambda p, t: encode_points(p, t, cfg))

        if n < self.chunk:
            out = enc(pts, table)
        else:
            # chunk boundary is deliberately n < chunk: at n == chunk the
            # direct path lets the XLA fuser merge the per-level one-hot
            # stages into one (B, ~90k) buffer (23 GB at B=64k — observed
            # AOT OOM); inside the lax.map scan region that fusion never
            # forms and the chunked path runs at the measured-fast rate.
            pad = (-n) % self.chunk
            padded = jnp.pad(pts, ((0, pad), (0, 0)))
            chunks = padded.reshape(-1, self.chunk, 3)
            out = jax.lax.map(
                lambda c: enc(c, table), chunks
            ).reshape(-1, cfg.out_dim)[:n]
        return out.reshape(*batch_shape, cfg.out_dim)
