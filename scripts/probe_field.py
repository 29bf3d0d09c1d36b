"""Field-stage probes: voxelizer query throughput + field train-step time.

VERDICT r2 #3: the hashgrid (8 corners x 12-16 levels per sample) is a
gather-heavy primitive on a TPU whose gathers serialize (~14 ns/row,
docs/DESIGN.md) — these stages had no TPU numbers.  Measures:

  1. 64^3 (262,144-point) voxel extraction through a FieldAdapter-style
     query (NerfField density + FeatureField 768-d), at the voxelizer's
     batch=4096 and at one full-grid call;
  2. one f3rm train step (4096 rays, hierarchical render, joint loss).

Reference counterparts: voxelize.py:17-141 (batched tcnn queries),
feature_field.py:71-82.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_tpu.recon.field import FeatureField, NerfField, RenderConfig, render_rays


def fetch(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def bench_query(batch: int, reps: int = 5):
    nerf = NerfField()
    feat = FeatureField()
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    p_nerf = nerf.init(rng, dummy, jnp.zeros((8, 3)), False)
    p_feat = feat.init(jax.random.fold_in(rng, 7), dummy)

    @jax.jit
    def query(pn, pf, pts):
        density = nerf.apply(pn, pts, None, True)
        feature = feat.apply(pf, pts)
        return density, feature

    n_total = 64 ** 3
    grid = np.stack(
        np.meshgrid(*[np.linspace(0, 1, 64, dtype=np.float32)] * 3,
                    indexing="ij"), axis=-1,
    ).reshape(-1, 3)

    # one warm pass
    t0 = time.time()
    d, f = query(p_nerf, p_feat, jnp.asarray(grid[:batch]))
    fetch(d)
    print(f"  query[b={batch}] compile+first: {time.time()-t0:.1f}s", flush=True)

    times = []
    for r in range(reps):
        # vary inputs per rep (dispatch dedup reports ~0 ms otherwise)
        off = np.float32(1e-4 * (r + 1))
        t0 = time.time()
        outs = []
        for i in range(0, n_total, batch):
            b = grid[i : i + batch]
            if len(b) < batch:
                b = np.pad(b, ((0, batch - len(b)), (0, 0)))
            outs.append(query(p_nerf, p_feat, jnp.asarray(b) + off))
        s = sum(fetch(d) for d, _ in outs)
        times.append(time.time() - t0)
    med = float(np.median(times))
    print(f"  query[b={batch}]: {med*1e3:.1f} ms for 64^3 "
          f"({n_total/med/1e6:.2f} M pts/s)", flush=True)
    return med


def bench_train_step(rays: int = 4096, reps: int = 5, use_proposal: bool = False):
    import optax

    from pixie_tpu.recon.field import ProposalField, render_rays_prop

    nerf = NerfField()
    feat = FeatureField()
    prop = ProposalField() if use_proposal else None
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    params = {
        "nerf": nerf.init(rng, dummy, jnp.zeros((8, 3)), False),
        "feat": feat.init(jax.random.fold_in(rng, 7), dummy),
    }
    if prop is not None:
        params["prop"] = prop.init(jax.random.fold_in(rng, 13), dummy)
    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)
    rcfg = RenderConfig(n_coarse=64, n_fine=32) if use_proposal else RenderConfig()

    nerf_apply = lambda p, pts, dirs, do: nerf.apply(p, pts, dirs, do)
    feat_apply = lambda p, pts: feat.apply(p, pts)
    prop_apply = (lambda p, pts: prop.apply(p, pts)) if prop else None

    @jax.jit
    def step(params, opt_state, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        origins = jax.random.uniform(k1, (rays, 3), minval=-1.0, maxval=1.0)
        dirs = jax.random.normal(k2, (rays, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb_gt = jax.random.uniform(k3, (rays, 3))
        feat_gt = jnp.zeros((rays, 768))

        def loss_fn(params):
            if prop is not None:
                out = render_rays_prop(
                    prop_apply, nerf_apply, feat_apply, params["prop"],
                    params["nerf"], params["feat"], origins, dirs, k2, rcfg,
                    train=True, with_features=True,
                )
            else:
                out = render_rays(
                    nerf_apply, feat_apply, params["nerf"], params["feat"],
                    origins, dirs, k2, rcfg, train=True, with_features=True,
                )
            loss = jnp.mean((out["rgb"] - rgb_gt) ** 2)
            floss = jnp.mean((out["feature"] - feat_gt) ** 2)
            if prop is not None:
                loss = loss + out["prop_loss"]
            return loss + 1e-3 * floss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, 1))
    fetch(loss)
    tag = "prop" if use_proposal else "full"
    print(f"  train_step[{rays} rays,{tag}] compile+first: {time.time()-t0:.1f}s",
          flush=True)
    times = []
    for r in range(reps):
        t0 = time.time()
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(rng, 100 + r))
        fetch(loss)
        times.append(time.time() - t0)
    med = float(np.median(times))
    print(f"  train_step[{rays} rays,{tag}]: {med*1e3:.1f} ms/step "
          f"({1/med:.2f} it/s)", flush=True)
    return med


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    print("voxel query:", flush=True)
    bench_query(4096)
    bench_query(64 ** 3)
    print("field training:", flush=True)
    bench_train_step(4096)
