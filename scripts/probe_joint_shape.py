"""Perf probe: does packing both material U-Nets into one C=128 net win?

Times (a) the current seg+cont pair (C=64 each, cond 32, hidden 128) and
(b) one joint-shaped net (C=128, cond 64, hidden 256, out 11) on the real
TPU.  The joint net here has random params — identical compute graph to the
planned block-diagonal fusion, so its timing is the fusion's timing.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.models.unet3d import (
    FeatureProjector,
    MyUNetModel,
    RegressionUNet,
    SegmentationUNet,
)

GRID, FEAT = 64, 768


def timed(fn, args, label, iters=10):
    t0 = time.time()
    float(fn(*args, jnp.float32(0.0)))
    print(f"{label} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    acc = 0.0
    for i in range(iters):
        acc += float(fn(*args, jnp.float32(1e-6 * (i + 1))))
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms  (probe {acc:.3f})", flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, GRID, GRID, GRID, FEAT), jnp.bfloat16)

    # ---- (a) current pair --------------------------------------------------
    seg = SegmentationUNet(feature_channels=FEAT, grid_size=GRID, dtype=jnp.bfloat16)
    cont = RegressionUNet(feature_channels=FEAT, grid_size=GRID, dtype=jnp.bfloat16)
    seg_p = seg.init(rng, x)["params"]
    cont_p = cont.init(rng, x)["params"]

    @jax.jit
    def pair(sp, cp, x, eps):
        x = x + eps.astype(x.dtype)
        a = seg.apply({"params": sp}, x)
        b = cont.apply({"params": cp}, x)
        return jnp.float32(a.mean()) + jnp.float32(b.mean())

    dt_pair = timed(pair, (seg_p, cont_p, x), "pair C=64")

    # ---- (b) joint-shaped single net --------------------------------------
    class Joint(type(seg).__bases__[0].__bases__[0] if False else object):
        pass

    import flax.linen as nn

    class JointProbe(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            h = FeatureProjector(64, 256, dtype=self.dtype, name="projector")(x)
            return MyUNetModel(
                model_channels=128,
                out_channels=11,
                num_res_blocks=3,
                channel_mult=(1, 1, 2, 4),
                spatial_size=GRID,
                dtype=self.dtype,
                name="unet",
            )(h)

    joint = JointProbe()
    j_p = joint.init(rng, x)["params"]

    @jax.jit
    def jfwd(p, x, eps):
        x = x + eps.astype(x.dtype)
        return jnp.float32(joint.apply({"params": p}, x).mean())

    dt_joint = timed(jfwd, (j_p, x), "joint C=128")

    print(
        f"pair {dt_pair*1e3:.1f} ms -> joint {dt_joint*1e3:.1f} ms "
        f"({1/dt_joint:.2f} grids/s, {dt_pair/dt_joint:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
