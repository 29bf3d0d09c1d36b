"""Recon-training measurement (r4 verdict weak #2): production-budget
wall-clocks + a per-phase floor profile of the f3rm field train step.

The reference trains per object on one GPU: `ns-train f3rm
--max-num-iterations 5000` then `gaussian-splatting/train.py --iterations
10000` (reference pipeline.py:84-153).  This script measures the TPU
analogs at production shapes:

  --profile-step   subtraction profile of the 4096-ray field step
                   (sampling machinery vs field eval vs bwd vs data gather)
  --field-iters N  field-training wall clock on a synthetic production-shape
                   dataset (default 0 = skip; 5000 = production budget)
  --gs-iters N     3DGS wall clock at 800^2/100k (0 = skip; 10000 = budget)

Run:  python scripts/bench_recon_train.py --profile-step --field-iters 500
"""

import argparse
import json
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_dataset(n_img=20, hw=800, feat_hw=24, feat_dim=768, seed=0):
    """Production-shape synthetic blender-style dataset: random textured
    images + CLIP-patch-shaped feature maps (ViT-L/14@336 on 800^2 gives a
    ~24^2 patch grid)."""
    rng = np.random.default_rng(seed)
    images = rng.random((n_img, hw, hw, 3), np.float32)
    feats = rng.standard_normal((n_img, feat_hw, feat_hw, feat_dim)).astype(
        np.float32)
    theta = np.linspace(0, 2 * np.pi, n_img, endpoint=False)
    c2w = np.zeros((n_img, 4, 4), np.float32)
    for i, th in enumerate(theta):
        # look-at origin from a ring of radius 2
        eye = np.array([2 * np.cos(th), 2 * np.sin(th), 0.8], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w[i, :3, 0], c2w[i, :3, 1] = right, up
        c2w[i, :3, 2], c2w[i, :3, 3] = -fwd, eye
        c2w[i, 3, 3] = 1.0
    focal = 0.5 * hw / np.tan(0.5 * 0.69)
    return {
        "images": images, "c2w": c2w,
        "intrinsics": (focal, focal, hw / 2, hw / 2),
    }, feats


def _timed(fn, probe, reps, label):
    """Median wall time of fn(i); probe(result) -> float forces completion.
    Varies the input per rep (dispatch-dedup trap, docs/DESIGN.md)."""
    t0 = time.time()
    probe(fn(0))
    compile_s = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.time()
        probe(fn(i + 1))
        ts.append(time.time() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"  {label:34s} {med:8.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return med


def profile_step(args):
    """Subtraction profile of the production field step at 4096 rays,
    n_coarse=64, n_fine=32, feat_dim=768."""
    import jax
    import jax.numpy as jnp
    import optax

    from pixie_tpu.recon.field import (FeatureField, NerfField,
                                       ProposalField, RenderConfig,
                                       _sample_pdf, _weights_from_sigma,
                                       render_rays_prop)
    from pixie_tpu.recon.train_field import FieldTrainConfig, make_ray_fn

    cfg = FieldTrainConfig()
    rcfg = cfg.render
    rays = args.rays or cfg.rays_per_batch
    ds, feats = synth_dataset(n_img=args.n_img, hw=args.hw,
                              feat_dim=cfg.feature_dim)
    sample_rays = make_ray_fn(ds, feats)

    nerf = NerfField(encoding=cfg.encoding)
    feat = FeatureField(feature_dim=cfg.feature_dim, encoding=cfg.encoding)
    prop = ProposalField()
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 3))
    params = {
        "nerf": nerf.init(rng, dummy, jnp.zeros((8, 3)), False),
        "feat": feat.init(jax.random.fold_in(rng, 7), dummy),
        "prop": prop.init(jax.random.fold_in(rng, 13), dummy),
    }
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    print(f"profile: {rays} rays, n_coarse={rcfg.n_coarse}, "
          f"n_fine={rcfg.n_fine}, feat_dim={cfg.feature_dim}, "
          f"params={n_params/1e6:.2f}M", flush=True)

    napply = lambda p, pts, dirs, do: nerf.apply(p, pts, dirs, do)
    fapply = lambda p, pts: feat.apply(p, pts)
    papply = lambda p, pts: prop.apply(p, pts)

    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    def rays_of(i):
        return sample_rays(jax.random.PRNGKey(i), rays)

    # --- A. data gather (ray gen + rgb + 768-dim feature target) ---------
    @jax.jit
    def jit_sample(key):
        o, d, rgb, fg = sample_rays(key, rays)
        return (jnp.float32(o.sum()) + rgb.sum()
                + (fg.sum() if fg is not None else 0.0) + d.sum())

    # --- B. sampling machinery (prop eval + pdf resample, no main field) -
    @jax.jit
    def jit_sampling(key):
        o, d, _, _ = sample_rays(key, rays)
        edges = jnp.linspace(rcfg.near, rcfg.far, rcfg.n_coarse + 1)
        t_edges = jnp.broadcast_to(edges, (rays, rcfg.n_coarse + 1))
        mids = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
        jit_ = (jax.random.uniform(key, mids.shape) - 0.5) \
            * (t_edges[..., 1:] - t_edges[..., :-1])
        t_p = mids + jit_
        pts_p = o[:, None, :] + t_p[..., None] * d[:, None, :]
        sigma_p = papply(params["prop"], pts_p * 0.5 + 0.5)[..., 0]
        w_p = _weights_from_sigma(sigma_p, t_edges)
        t_f = _sample_pdf(t_edges, w_p, rcfg.n_fine,
                          jax.random.fold_in(key, 1), True)
        return jnp.float32(t_f.sum())

    # --- C. main-field eval fwd (nerf + 768-dim feature head) ------------
    @jax.jit
    def jit_field_fwd(key):
        o, d, _, _ = sample_rays(key, rays)
        t = jnp.linspace(rcfg.near, rcfg.far, rcfg.n_fine)
        pts = (o[:, None, :] + t[None, :, None] * d[:, None, :]) * 0.5 + 0.5
        dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
        sigma, rgb = napply(params["nerf"], pts, dirs, False)
        fe = fapply(params["feat"], pts)
        return jnp.float32(sigma.sum() + rgb.sum() + fe.sum())

    # --- D. full fwd loss --------------------------------------------------
    def loss_of(p, key):
        o, d, rgb_gt, feat_gt = sample_rays(key, rays)
        out = render_rays_prop(
            papply, napply, fapply, p["prop"], p["nerf"], p["feat"],
            o, d, jax.random.fold_in(key, 2), rcfg, train=True,
            with_features=True)
        loss = jnp.mean((out["rgb"] - rgb_gt) ** 2) + out["prop_loss"]
        loss = loss + cfg.feat_loss_weight * jnp.mean(
            (out["feature"] - feat_gt) ** 2)
        return loss

    jit_fwd = jax.jit(lambda key: loss_of(params, key))

    # --- E. full train step (fwd+bwd+adam) --------------------------------
    @jax.jit
    def jit_step(p, os_, key):
        loss, grads = jax.value_and_grad(loss_of)(p, key)
        updates, os_ = tx.update(grads, os_, p)
        return optax.apply_updates(p, updates), os_, loss

    reps = args.reps
    res = {}
    if not args.only_step:
        res["sample_ms"] = _timed(
            lambda i: jit_sample(jax.random.PRNGKey(i)), float, reps,
            "A data gather (rays+rgb+feat_gt)")
        res["sampling_ms"] = _timed(
            lambda i: jit_sampling(jax.random.PRNGKey(i)), float, reps,
            "B proposal+pdf machinery")
        res["field_fwd_ms"] = _timed(
            lambda i: jit_field_fwd(jax.random.PRNGKey(i)), float, reps,
            "C main-field fwd (nerf+feat)")
        res["full_fwd_ms"] = _timed(
            lambda i: jit_fwd(jax.random.PRNGKey(i)), float, reps,
            "D full fwd loss")

    state = {"p": params, "o": opt_state}

    def step_i(i):
        state["p"], state["o"], loss = jit_step(
            state["p"], state["o"], jax.random.PRNGKey(i))
        return loss

    res["step_ms"] = _timed(step_i, float, reps, "E full train step")
    if not args.only_step:
        res["bwd_overhead_ms"] = res["step_ms"] - res["full_fwd_ms"]
        print(f"  bwd+adam overhead {res['bwd_overhead_ms']:.1f} ms; "
              f"unattributed fwd {res['full_fwd_ms'] - res['sampling_ms'] - res['field_fwd_ms'] + res['sample_ms']:.1f} ms "
              f"(A counted inside B/C/D)", flush=True)
    return res


def field_wallclock(iters: int):
    """End-to-end train_feature_field wall clock on the synthetic
    production-shape dataset (5000 iters = the pipeline budget,
    config/training_3d/default.yaml)."""
    import dataclasses
    import tempfile

    from pixie_tpu.recon import train_field as tf

    ds, feats = synth_dataset()
    # route the synthetic arrays through load_dataset's contract
    orig_load = tf.load_dataset
    tf.load_dataset = lambda *a, **k: dict(ds)
    feat_path = os.path.join(tempfile.mkdtemp(), "feats.npy")
    np.save(feat_path, feats)
    cfg = dataclasses.replace(tf.METHOD_CONFIGS["f3rm"],
                              max_iterations=iters, eval_views=0)
    out = tempfile.mkdtemp()
    t0 = time.time()
    try:
        tf.train_feature_field(ds, out, max_iterations=iters,
                               features_path=feat_path, cfg=cfg,
                               log_every=max(iters // 10, 1))
    finally:
        tf.load_dataset = orig_load
    dt = time.time() - t0
    # loop-only time (the trainer's own t0->end window, excluding setup /
    # dataset upload / checkpoint save) from the metrics it writes
    with open(os.path.join(out, "metrics.json")) as f:
        loop_s = json.load(f)["train_s"]
    print(f"field train {iters} iters: {dt:.1f}s total "
          f"({dt / iters * 1e3:.1f} ms/iter), loop {loop_s:.1f}s "
          f"({loop_s / iters * 1e3:.1f} ms/iter)", flush=True)
    return dt


def gs_train_wallclock(iters: int):
    """train_gaussian_splatting wall clock at 800^2 / 100k gaussians on a
    synthetic dataset (densify/reset disabled so capacity stays fixed and
    the PIXIE_GS_SCAN A/B isolates the loop-scheduling cost; the loop
    includes adam, unlike the raw gs step-loop in bench_gs.py)."""
    import dataclasses
    import tempfile

    from pixie_tpu.recon import train_gaussians as tg

    ds, _ = synth_dataset(n_img=8)
    orig_load = tg.load_dataset
    tg.load_dataset = lambda *a, **k: dict(ds)
    rng = np.random.default_rng(0)
    init = rng.uniform(-0.5, 0.5, (100_000, 3)).astype(np.float32)
    cfg = tg.GSTrainConfig(iterations=iters, densify_from=10**9,
                           opacity_reset_interval=10**9)
    out = tempfile.mkdtemp()
    t0 = time.time()
    try:
        tg.train_gaussian_splatting(ds, out, cfg=cfg, init_points=init,
                                    log_every=max(iters // 10, 1))
    finally:
        tg.load_dataset = orig_load
    dt = time.time() - t0
    print(f"gs trainer {iters} iters: {dt:.1f}s "
          f"({dt / iters * 1e3:.1f} ms/iter incl. dispatch)", flush=True)
    return dt


def gs_wallclock(iters: int):
    """3DGS training wall clock at 800^2 / 100k gaussians (the reference
    gaussian-splatting train.py --iterations 10000 analog)."""
    import subprocess

    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "bench_gs.py"),
         "--iters", str(iters)],
        check=True)
    return time.time() - t0


def main():
    # surface the trainers' per-log-boundary elapsed marks (field logs every
    # iters//10 with loop-elapsed seconds): steady-state per-iter is the
    # delta between marks, separating one-off costs (dataset upload over the
    # tunnel, chunk compile/cache-load, checkpoint save) from the loop —
    # needed to attribute tunnel-window variance (r5h: warm field-1000 runs
    # 510.7 s vs 734.9 s on identical cached programs).
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile-step", action="store_true")
    ap.add_argument("--only-step", action="store_true",
                    help="profile only stage E (full train step) — for "
                         "env-toggle A/B runs where A-D are irrelevant")
    ap.add_argument("--field-iters", type=int, default=0)
    ap.add_argument("--gs-iters", type=int, default=0)
    ap.add_argument("--gs-train-iters", type=int, default=0,
                    help="train_gaussian_splatting wall clock (incl. adam; "
                         "respects PIXIE_GS_SCAN)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rays", type=int, default=0,
                    help="override rays/batch (0 = production 4096)")
    ap.add_argument("--n-img", type=int, default=20)
    ap.add_argument("--hw", type=int, default=800)
    args = ap.parse_args()

    out = {}
    if args.profile_step or args.only_step:
        out.update(profile_step(args))
    if args.field_iters:
        out["field_train_s"] = field_wallclock(args.field_iters)
        out["field_iters"] = args.field_iters
    if args.gs_iters:
        out["gs_train_s"] = gs_wallclock(args.gs_iters)
        out["gs_iters"] = args.gs_iters
    if args.gs_train_iters:
        out["gs_trainer_s"] = gs_train_wallclock(args.gs_train_iters)
        out["gs_trainer_iters"] = args.gs_train_iters
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
