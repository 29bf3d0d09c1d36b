"""3DGS training-step benchmark at reference scale (VERDICT weak #2).

Times jitted L1+D-SSIM train steps (value_and_grad through the tile-culled
rasterizer) at 800x800 with 100k gaussians — the reference trains 10k iters
at this scale per asset (gaussian-splatting/train.py).

Run:  python scripts/bench_gs.py [--n 100000] [--res 800] [--iters 20]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.recon.rasterizer import Camera, rasterize_tiled
from pixie_tpu.recon.train_gaussians import ssim


def make_params(n, rng):
    return {
        "xyz": jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)),
        # SH layout is (N, K, 3): dc (N,1,3) + rest (N,15,3)
        "f_dc": jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32)),
        "f_rest": jnp.zeros((n, 15, 3), jnp.float32),
        "opacity": jnp.asarray(rng.normal(-2, 0.5, (n, 1)).astype(np.float32)),
        "scaling": jnp.asarray(rng.normal(-5, 0.5, (n, 3)).astype(np.float32)),
        "rotation": jnp.asarray(
            np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile_cap", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    params = make_params(args.n, rng)
    cam = Camera(args.res, args.res, fx=args.res / 1.2, fy=args.res / 1.2,
                 cx=args.res / 2, cy=args.res / 2)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 4.0]
    c2w[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    viewmat = jnp.asarray(np.linalg.inv(c2w).astype(np.float32))
    target = jnp.asarray(
        rng.uniform(0, 1, (args.res, args.res, 3)).astype(np.float32))

    def loss_fn(p, tgt):
        img, _ = rasterize_tiled(p, viewmat, cam, bg_color=1.0,
                                 tile_cap=args.tile_cap)
        l1 = jnp.abs(img - tgt).mean()
        return 0.8 * l1 + 0.2 * (1.0 - ssim(img, tgt))

    step = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.perf_counter()
    loss, grads = step(params, target)
    jax.block_until_ready(grads)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)

    times = []
    for i in range(args.iters):
        # vary inputs per iter (identical dispatches dedupe on this runtime)
        tgt = target + (i % 7) * 1e-4
        t0 = time.perf_counter()
        loss, grads = step(params, tgt)
        jax.block_until_ready(grads)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"train step: {med * 1e3:.1f} ms median -> {1 / med:.2f} iters/s "
          f"@ {args.n} gaussians, {args.res}^2", flush=True)
    print(f"10k-iter training estimate: {10_000 * med / 60:.1f} min")


if __name__ == "__main__":
    main()
