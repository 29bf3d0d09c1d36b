"""Ablate the P2G/G2P kernel internals to find the 3.6 ms/kernel cost.

Variants (each scanned x30 inside one jit on the real 100k layout):
  full     — shipped kernel
  nopairs  — window/pair factor construction replaced by constants (dot kept)
  nodot    — pairs kept, MXU dot replaced by a broadcast add
  minimal  — program does only acc += const (pure pipeline/program overhead)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.ops import tiling, transfer
from pixie_tpu.ops.tiling import PBLK, WIN_S
from pixie_tpu.ops.transfer import (_CH, _FX, _M, _QA, _QBX, _QBY, _QBZ,
                                    _QSX, _QSY, _QSZ, _U0, N_GRID_CH,
                                    _pairs, _window_factors)

N = 100_000


def make_layout():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.75, 1.25, (N, 3)).astype(np.float32)
    lay = tiling.build_padded_layout(x, 50, 25.0)
    npd = lay["block_tile"].shape[0] * PBLK
    pdata = jnp.asarray(rng.normal(size=(_CH, npd)).astype(np.float32) * 0.1)
    # u0 rows must be valid window offsets
    pdata = pdata.at[_U0:_U0 + 3].set(
        jnp.asarray(rng.integers(0, 10, (3, npd)).astype(np.float32)))
    pdata = pdata.at[_FX:_FX + 3].set(
        jnp.asarray(rng.uniform(0.5, 1.5, (3, npd)).astype(np.float32)))
    return lay, pdata


def kernel_variant(mode):
    def k(tile_ref, pdata_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        first = jnp.logical_or(i == 0, tile_ref[i] != tile_ref[jnp.maximum(i - 1, 0)])
        last = jnp.logical_or(i == nb - 1,
                              tile_ref[jnp.minimum(i + 1, nb - 1)] != tile_ref[i])

        @pl.when(first)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        d = pdata_ref[...]
        if mode == "minimal":
            acc_ref[...] = acc_ref[...] + d[0, 0]
        else:
            if mode == "nopairs":
                x1 = jnp.full((PBLK, WIN_S), 0.1, jnp.float32)
                x2 = x1; x3 = x1
                p11 = jnp.full((PBLK, WIN_S * WIN_S), 0.1, jnp.float32)
                p21 = p11; p12 = p11; p31 = p11; p13 = p11
            else:
                x1, x2, x3 = _window_factors(d[_U0 + 0], d[_FX + 0])
                p11, p21, p12, p31, p13 = _pairs(
                    d[_U0 + 1], d[_FX + 1], d[_U0 + 2], d[_FX + 2])

            def lefts(per_ch_x):
                return jnp.concatenate(per_ch_x, axis=1)

            m = d[_M]
            l11 = lefts([x1 * d[_QA + c][:, None] + x2 * d[_QBX + c][:, None]
                         + x3 * d[_QSX + c][:, None] for c in range(3)]
                        + [x1 * m[:, None]])
            zero = jnp.zeros_like(x1)
            l21 = lefts([x1 * d[_QBY + c][:, None] for c in range(3)] + [zero])
            l12 = lefts([x1 * d[_QBZ + c][:, None] for c in range(3)] + [zero])
            l31 = lefts([x1 * d[_QSY + c][:, None] for c in range(3)] + [zero])
            l13 = lefts([x1 * d[_QSZ + c][:, None] for c in range(3)] + [zero])
            left_big = jnp.concatenate([l11, l21, l12, l31, l13], axis=0)
            pair_big = jnp.concatenate([p11, p21, p12, p31, p13], axis=0)
            if mode == "nodot":
                acc_ref[...] = (acc_ref[...] + left_big[:64, :1]
                                + pair_big[:1, :])
            else:
                acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
                    left_big, pair_big, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(last)
        def _():
            out_ref[...] = acc_ref[...][None]

    return k


def run(mode, lay, pdata, t3=343):
    nb = lay["block_tile"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((_CH, PBLK), lambda i, tr: (0, i))],
        out_specs=pl.BlockSpec((1, N_GRID_CH * WIN_S, WIN_S * WIN_S),
                               lambda i, tr: (tr[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((N_GRID_CH * WIN_S, WIN_S * WIN_S),
                                   jnp.float32)],
    )
    call = lambda pd: pl.pallas_call(
        kernel_variant(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t3, N_GRID_CH * WIN_S, WIN_S * WIN_S), jnp.float32),
    )(lay["block_tile"], pd)

    @jax.jit
    def scan30(pd, eps):
        def body(c, _):
            w = call(pd + c)
            return jnp.float32(w[0, 0, 0]) + eps * 0, None
        out, _ = jax.lax.scan(body, eps, None, length=30)
        return out

    float(scan30(pdata, jnp.float32(0.0)))
    t0 = time.time()
    outs = [scan30(pdata, jnp.float32(1e-6 * i)) for i in range(3)]
    [float(o) for o in outs]
    dt = (time.time() - t0) / (3 * 30)
    print(f"p2g[{mode}]: {dt*1e3:.3f} ms/call", flush=True)


def main():
    lay, pdata = make_layout()
    print(f"n_blocks={lay['block_tile'].shape[0]}", flush=True)
    for mode in ("full", "nopairs", "nodot", "minimal"):
        run(mode, lay, pdata)


if __name__ == "__main__":
    main()
