"""Probe: throughput of Mosaic's tpu.dynamic_gather (VMEM sublane gather).

Mosaic lowers lax.gather to tpu.dynamic_gather ONLY when indices, operand
and output shapes all match (jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule): out[i,j] = x[idx[i,j], j] (axis=0, lanes batched)
or out[i,j] = x[i, idx[i,j]] (axis=1, sublanes batched).

For a hash-table lookup: store the table column-broadcast (T, 128) in VMEM
and pack 85+ points' corner indices per lane column -> one op gathers
T*128 values.  If this runs at VMEM speeds it replaces the ~16.5 ns/row
serialized HBM gathers that dominate field training (10.5 s/step).
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

T = 8192      # table rows / gather rows per op
L = 128       # lanes


def kernel_axis0(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(
        table_ref[...], idx_ref[...], axis=0, mode="promise_in_bounds"
    )


def kernel_axis1(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(
        table_ref[...], idx_ref[...], axis=1, mode="promise_in_bounds"
    )


def run(name, kernel, axis):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(T, L)).astype(np.float32))
    hi = T if axis == 0 else L
    idx = jnp.asarray(rng.integers(0, hi, size=(T, L)).astype(np.int32))

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        t0 = time.time()
        out = jax.jit(fn)(table, idx)
        out.block_until_ready()
        print(f"{name}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
        tn, ix = np.asarray(table), np.asarray(idx)
        ref = (np.take_along_axis(tn, ix, axis=axis))
        err = float(np.abs(np.asarray(out) - ref).max())
        print(f"{name}: max err {err:.2e}", flush=True)
        reps = 50
        idxs = [jnp.asarray(rng.integers(0, hi, size=(T, L)).astype(np.int32))
                for _ in range(reps)]
        jfn = jax.jit(fn)
        t0 = time.time()
        outs = [jfn(table, i) for i in idxs]
        s = sum(float(o[0, 0]) for o in outs)
        dt = (time.time() - t0) / reps
        n = T * L
        print(f"{name}: {dt*1e6:.0f} us per {n} gathered values "
              f"({dt/n*1e9:.3f} ns/value)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    run("dyngather axis0 (sublane idx, lane batch)", kernel_axis0, 0)
    run("dyngather axis1 (lane idx, sublane batch)", kernel_axis1, 1)
