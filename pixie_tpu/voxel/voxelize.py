"""Voxelizer: sample a feature field into a dense voxel grid + occupancy mask.

Port of pixie/voxel/voxelize.py (extract_clip_voxel_grid:17-141 and
_create_occupancy_mask:188-263) with the same artifact contract:
  clip_features.npz (metadata), clip_features_features.npy (D,D,D,C fp16),
  clip_features_alphas.npy, clip_features_rgb.npy, clip_features_mask.npy,
  clip_features_pc.ply.

Differences from the reference, TPU-first:
  * field queries are batched jit calls against any JAX field adapter
    (duck-typed: ``query(points) -> {"density","feature"}``, ``get_rgb``);
  * alpha = 1 - exp(-density * delta) (field_adapter.py:14-18);
  * alpha-weighted features = alpha * feature (optimize.py:224-228);
  * statistical outlier removal uses the device kNN (open3d semantics:
    keep points whose mean kNN distance < mean + std_ratio * std);
  * floating-cluster removal stays sklearn DBSCAN host-side (as in reference).
"""

from __future__ import annotations

import functools
import logging
import os
import threading
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from pixie_tpu.sim.material_field import knn_mean_dist
from pixie_tpu.utils.io import write_ply


def _pack_rows(density, feature, rgb, delta, alpha_weighted: bool):
    """On-device alpha + fp16 pack; the device->host fetch moves fp16
    (halves the remote-tunnel bytes — the (64^3, 768) feature grid is
    402 MB in fp16, 804 MB in f32)."""
    density = jnp.asarray(density, jnp.float32).reshape(-1, 1)
    alpha = 1.0 - jnp.exp(-density * delta)
    feature = jnp.asarray(feature, jnp.float32)
    if alpha_weighted:
        feature = alpha * feature  # get_qp_feats (optimize.py:224-228)
    return (feature.astype(jnp.float16), alpha.astype(jnp.float16),
            jnp.asarray(rgb, jnp.float32).astype(jnp.float16))


_pack_batch = functools.partial(jax.jit, static_argnames=("alpha_weighted",))(
    _pack_rows)


def build_packed_grid_query(density_feature_fn, rgb_fn):
    """One-dispatch voxel-grid query: a jitted ``lax.scan`` over fixed-size
    point chunks replacing the per-batch query/rgb/pack dispatch loop.

    On the remote TPU runtime each program execution carries a host
    round-trip tax that async dispatch hides until the first fetch — the
    64-batch loop (~192 programs) surfaced as 35-95 s of
    ``alphas_rgb_fetch_s`` while moving only ~2 MB (docs/DESIGN.md r4e/r4f).
    One scan = one program = one tax.

    ``density_feature_fn(params, pts01) -> (density (B,1)|(B,), feature
    (B,C))`` and ``rgb_fn(params, pts01) -> (B,3)`` must be pure jax
    functions; ``params`` is an arbitrary pytree passed through (never
    closed over, so re-using the builder across checkpoints re-uses the
    compiled program).

    Returns ``query(params, flat01, chunk, delta, alpha_weighted) ->
    (features (Tpad,C) fp16 dev, alphas_rgb (Tpad,4) fp16 dev)`` where
    column 0 of ``alphas_rgb`` is alpha and 1:4 are rgb; rows past the
    original ``T`` are tail padding.
    """

    @functools.partial(jax.jit, static_argnames=("alpha_weighted",))
    def _scan(params, chunks, delta, alpha_weighted):
        def body(carry, pts01):
            density, feature = density_feature_fn(params, pts01)
            rgb = rgb_fn(params, pts01)
            f16, a16, r16 = _pack_rows(density, feature, rgb, delta,
                                       alpha_weighted)
            return carry, (f16, jnp.concatenate([a16, r16], axis=-1))

        _, (f, ar) = jax.lax.scan(body, 0, chunks)
        return f.reshape(-1, f.shape[-1]), ar.reshape(-1, 4)

    def query(params, flat01, chunk, delta, alpha_weighted=True):
        flat01 = np.asarray(flat01, np.float32)
        total = flat01.shape[0]
        npad = -(-total // chunk) * chunk
        if npad != total:
            flat01 = np.concatenate(
                [flat01, np.zeros((npad - total, 3), np.float32)], axis=0)
        chunks = jnp.asarray(flat01.reshape(-1, chunk, 3))
        return _scan(params, chunks, jnp.float32(delta), alpha_weighted)

    return query


def dense_voxel_grid(min_bounds, max_bounds, voxel_size: float) -> np.ndarray:
    """(nx,ny,nz,3) grid of voxel-corner coordinates
    (f3rm_robot/initial_proposals.py:18-27: arange per axis, ij indexing)."""
    axes = [
        np.arange(lo, hi, voxel_size, dtype=np.float32)
        for lo, hi in zip(min_bounds, max_bounds)
    ]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid


def get_alpha(density: np.ndarray, delta: float) -> np.ndarray:
    """alpha compositing (field_adapter.py:14-18)."""
    return 1.0 - np.exp(-np.asarray(density) * delta)


def statistical_outlier_mask(
    points: np.ndarray, nb_neighbors: int = 50, std_ratio: float = 4.0
) -> np.ndarray:
    """open3d remove_statistical_outlier semantics: mean distance to the
    nb_neighbors nearest neighbors; keep if < global_mean + std_ratio * std."""
    n = len(points)
    if n <= nb_neighbors:
        return np.ones(n, bool)
    # the per-point k-mean reduces on device; only (n,) f32 crosses the
    # tunnel (36 MB -> 0.35 MB at 87k points, docs/DESIGN.md r4d)
    mean_d = knn_mean_dist(points, points, k=nb_neighbors, skip_self=True)
    mu, sigma = mean_d.mean(), mean_d.std()
    return mean_d < mu + std_ratio * sigma


def largest_clusters_mask(
    points: np.ndarray, eps: float, min_points: int = 10
) -> np.ndarray:
    """DBSCAN; keep all non-noise points (voxelize.py:245-252)."""
    from sklearn.cluster import DBSCAN  # noqa: PLC0415

    if len(points) == 0:
        return np.zeros(0, bool)
    labels = DBSCAN(eps=eps, min_samples=min_points).fit_predict(points)
    return labels != -1


def lattice_nonnoise_mask(
    ijk: np.ndarray, shape, r_lattice: float, min_points: int = 10
) -> np.ndarray:
    """DBSCAN non-noise mask for points ON A REGULAR LATTICE, exactly.

    DBSCAN keeps a point iff it lies within ``eps`` of a *core* point (one
    with >= min_samples neighbors within eps, counting itself) — labels are
    irrelevant when only ``labels != -1`` is consumed.  On a lattice with
    spacing h and eps = r*h this is pure grid morphology:

        counts = occupancy (x) ball(r)        # closed ball, offsets s<=r^2
        core   = occ & (counts >= min_points)
        keep   = occ & (core (x) ball(r) > 0)

    Both convolutions run as one FFT pair over the (64^3) grid — ~0.1 s vs
    ~7 s for sklearn's tree-based DBSCAN on 87k points (docs/DESIGN.md r4d).
    Exactness: voxel coords are exact float multiples of h (h = 1/64 and the
    bounds are powers of two), so sklearn's float64 distance test
    d <= eps is equivalent to the integer test |di|^2+|dj|^2+|dk|^2 <= r^2;
    the 1e-6 slack only absorbs float error in r_lattice itself.
    """
    if len(ijk) == 0:
        return np.zeros(0, bool)
    from scipy.signal import fftconvolve  # noqa: PLC0415

    # float64 FFTs: at production 64^3 grids with 10^5+ occupied voxels the
    # float32 transform's roundoff can approach 0.5 at the counts==min_points
    # boundary (ADVICE r4); in double the margin is ~1e-9
    occ = np.zeros(shape, np.float64)
    occ[tuple(ijk.T)] = 1.0
    rr = int(np.floor(r_lattice + 1e-6))
    g = np.arange(-rr, rr + 1)
    ball = (
        (g[:, None, None] ** 2 + g[None, :, None] ** 2 + g[None, None, :] ** 2)
        <= r_lattice * r_lattice + 1e-6
    ).astype(np.float64)
    counts = np.rint(fftconvolve(occ, ball, mode="same"))
    core = (occ > 0) & (counts >= min_points)
    near_core = np.rint(fftconvolve(core.astype(np.float64), ball, mode="same"))
    keep = (occ > 0) & (near_core > 0)
    return keep[tuple(ijk.T)]


def _ball_kernel(r_lattice: float) -> np.ndarray:
    rr = int(np.floor(r_lattice + 1e-6))
    g = np.arange(-rr, rr + 1)
    return (
        (g[:, None, None] ** 2 + g[None, :, None] ** 2 + g[None, None, :] ** 2)
        <= r_lattice * r_lattice + 1e-6
    ).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("min_points",))
def _lattice_keep_grid(occ_bool, ball, min_points: int):
    """Device half of lattice_nonnoise_mask: two ball convolutions over the
    occupancy grid (counts -> core -> near-core), f32 at HIGHEST precision so
    the 0/1 sums (<= |ball| ~ 515 at r=5) stay exact integers on the MXU."""

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None, None], ball[None, None], window_strides=(1, 1, 1),
            padding="SAME", precision=jax.lax.Precision.HIGHEST)[0, 0]

    occ = occ_bool.astype(jnp.float32)
    counts = jnp.round(conv(occ))
    core = occ_bool & (counts >= min_points)
    near_core = conv(core.astype(jnp.float32))
    return occ_bool & (near_core > 0.5)


def lattice_nonnoise_mask_device(
    ijk: np.ndarray, shape, r_lattice: float, min_points: int = 10
) -> np.ndarray:
    """lattice_nonnoise_mask with the convolutions on device.

    Same exact-DBSCAN semantics; moves ~0.5 MB over the tunnel (bool grid
    out, bool grid back) instead of paying 2-10 s of host-FFT time on the
    contended 1-CPU box (docs/DESIGN.md r4h voxelize variance)."""
    if len(ijk) == 0:
        return np.zeros(0, bool)
    occ = np.zeros(shape, bool)
    occ[tuple(ijk.T)] = True
    keep = np.asarray(_lattice_keep_grid(
        jnp.asarray(occ), jnp.asarray(_ball_kernel(r_lattice)),
        int(min_points)))
    return keep[tuple(ijk.T)]


@functools.partial(jax.jit, static_argnames=("k",))
def _lattice_knn_stats(occ_bool, shell_kernels, shell_d, k: int):
    """Device half of lattice_knn_mean_dist.

    One grouped conv counts, for every voxel, its occupied neighbors per
    integer-distance shell; the exact mean distance to the k nearest
    neighbors then falls out of a cumulative walk over shells in
    increasing-distance order (distances on a lattice are h*sqrt(s) for
    integer s — no sort, no gather).  Returns (mean_grid, complete_grid):
    ``complete`` is False where fewer than k neighbors live within the
    shell radius (caller falls back to brute kNN for those rows)."""
    occ = occ_bool.astype(jnp.float32)
    # (1,1,D,H,W) conv (S,1,w,w,w) -> (1,S,D,H,W): per-shell neighbor counts
    counts = jax.lax.conv_general_dilated(
        occ[None, None], shell_kernels, window_strides=(1, 1, 1),
        padding="SAME", precision=jax.lax.Precision.HIGHEST)[0]
    counts = jnp.round(counts)  # exact integers (sums of 0/1)
    csum = jnp.cumsum(counts, axis=0)
    taken_before = csum - counts
    m = jnp.clip(k - taken_before, 0.0, counts)  # shells consumed per voxel
    acc = jnp.einsum("s,sxyz->xyz", shell_d, m,
                     precision=jax.lax.Precision.HIGHEST)
    complete = csum[-1] >= k
    return acc / k, complete


def lattice_knn_mean_dist(
    ijk: np.ndarray, shape, voxel_size: float, k: int, r_max: int = 6
) -> np.ndarray:
    """Exact mean k-NN distance for points on a regular lattice.

    open3d remove_statistical_outlier needs each point's mean distance to
    its k nearest neighbors; on the voxel lattice those distances are
    h*sqrt(s) for integer s, so per-shell neighbor COUNTS (one conv over
    the occupancy grid) determine the k-NN mean exactly — no 87k x 87k
    distance matrix, no top-k.  Points with < k neighbors within ``r_max``
    cells (isolated outliers, typically a handful) fall back to the brute
    device kNN, preserving exact semantics everywhere."""
    n = len(ijk)
    if n == 0:
        return np.zeros(0, np.float32)
    occ = np.zeros(shape, bool)
    occ[tuple(ijk.T)] = True

    g = np.arange(-r_max, r_max + 1)
    s2 = (g[:, None, None] ** 2 + g[None, :, None] ** 2
          + g[None, None, :] ** 2)
    shells = np.unique(s2)
    shells = shells[(shells > 0) & (shells <= r_max * r_max)]
    kernels = np.stack([(s2 == s).astype(np.float32) for s in shells])
    shell_d = (np.sqrt(shells.astype(np.float64)) * voxel_size).astype(
        np.float32)

    mean_grid, complete_grid = _lattice_knn_stats(
        jnp.asarray(occ), jnp.asarray(kernels[:, None]),
        jnp.asarray(shell_d), int(k))
    mean_d = np.asarray(mean_grid)[tuple(ijk.T)]
    complete = np.asarray(complete_grid)[tuple(ijk.T)]
    if not complete.all():
        # exact fallback for the sparse tail (same brute path as before)
        pts = ijk.astype(np.float32) * voxel_size
        sub = np.nonzero(~complete)[0]
        mean_d[sub] = knn_mean_dist(pts[sub], pts, k=k, skip_self=True)
    return mean_d.astype(np.float32)


def create_occupancy_mask(
    voxel_grid: np.ndarray,
    alphas: np.ndarray,
    rgb: np.ndarray,
    alpha_threshold: float = 0.01,
    gray_threshold: float = 0.05,
    run_outlier_filter: bool = True,
    nb_neighbors: int = 50,
    std_ratio: float = 4.0,
    min_cluster_pts: int = 10,
    eps_multiplier: float = 5.0,
    voxel_size: float = 1.0 / 64,
    timings: dict | None = None,
) -> np.ndarray:
    """Occupancy = alpha > thr AND rgb-mean > gray AND statistical-inlier AND
    non-noise DBSCAN cluster (_create_occupancy_mask, voxelize.py:188-263)."""
    shape = voxel_grid.shape[:-1]
    coords = voxel_grid.reshape(-1, 3)
    alphas_flat = np.asarray(alphas, np.float32).reshape(-1)
    rgb_flat = np.asarray(rgb, np.float32).reshape(-1, 3)

    idx = np.where(alphas_flat > alpha_threshold)[0]
    # gray-background filter (optimize.py:264-300): mean RGB intensity
    non_bg = rgb_flat[idx].mean(axis=-1) > gray_threshold
    logging.info("Removed %d black background voxels out of %d", int((~non_bg).sum()), len(idx))
    idx = idx[non_bg]

    if run_outlier_filter and len(idx):
        t0 = time.perf_counter()
        if (os.environ.get("PIXIE_LATTICE_KNN", "1") == "1"
                and len(idx) > nb_neighbors):
            # exact k-NN means from per-shell lattice counts (one conv)
            # instead of the 87k x 87k brute distance matrix — the r4
            # funnel's largest ex-warm cost (7.6-10.2 s, r5a)
            ijk0 = np.stack(np.unravel_index(idx, shape), axis=1)
            mean_d = lattice_knn_mean_dist(
                ijk0, shape, voxel_size, k=nb_neighbors)
            stat_keep = mean_d < mean_d.mean() + std_ratio * mean_d.std()
        else:
            stat_keep = statistical_outlier_mask(
                coords[idx], nb_neighbors, std_ratio)
        idx = idx[stat_keep]
        if timings is not None:
            timings["outlier_knn_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if os.environ.get("PIXIE_LATTICE_DBSCAN", "1") == "1":
            # grid points are a regular lattice with spacing voxel_size and
            # eps = eps_multiplier * voxel_size -> exact DBSCAN by grid
            # morphology (lattice_nonnoise_mask docstring); default runs the
            # convolutions on device (~0.5 MB traffic, kills the 2-10 s
            # host-FFT variance), PIXIE_LATTICE_DEVICE=0 keeps them host-side
            ijk = np.stack(np.unravel_index(idx, shape), axis=1)
            lattice_fn = (
                lattice_nonnoise_mask_device
                if os.environ.get("PIXIE_LATTICE_DEVICE", "1") == "1"
                else lattice_nonnoise_mask)
            cluster_keep = lattice_fn(
                ijk, shape, r_lattice=eps_multiplier,
                min_points=min_cluster_pts)
        else:
            cluster_keep = largest_clusters_mask(
                coords[idx], eps=voxel_size * eps_multiplier,
                min_points=min_cluster_pts)
        idx = idx[cluster_keep]
        if timings is not None:
            timings["dbscan_s"] = time.perf_counter() - t0

    mask = np.zeros(coords.shape[0], bool)
    mask[idx] = True
    return mask.reshape(shape)


def extract_feature_voxel_grid(
    field,
    output_path: str | Path,
    bounds=((-0.5, 0.5), (-0.5, 0.5), (-0.5, 0.5)),
    voxel_size: float = 1.0 / 64,
    # the reference queries 4096 points/batch (config/voxelization
    # default.yaml:14); on TPU that shape is 13x slower than large batches
    # (per-call overhead + bad MXU shapes, docs/DESIGN.md "Field stage") —
    # default to 64k points per call
    batch_size: int = 65536,
    alpha_weighted: bool = True,
    alpha_threshold_for_mask: float = 0.01,
    gray_threshold_for_mask: float = 0.05,
    run_outlier_filter: bool = True,
    nb_neighbors: int = 50,
    std_ratio: float = 4.0,
    min_cluster_pts: int = 10,
    eps_multiplier: float = 5.0,
    expected_grid: int | None = 64,
    async_fetch: bool | None = None,
) -> dict:
    """Sample ``field`` on the dense grid and write the artifact set.

    ``field`` duck-type: ``query(points (B,3)) -> {"density" (B,1)|(B,),
    "feature" (B,C)}`` and ``get_rgb(points) -> (B,3)``; arrays may be jax or
    numpy.  Returns the artifact path dict.

    ``async_fetch`` (default ON since r5; ``PIXIE_VOX_ASYNC_FETCH=0`` to
    disable): the
    feature-grid device->host fetch and its ``*_features.npy`` save run on a
    background thread, and the returned dict additionally carries

    * ``features_dev`` — the dense (D,D,D,C) fp16 feature grid ON DEVICE,
      with sub-threshold rows zeroed exactly like the host artifact, so an
      in-process consumer (U-Net inference) can start immediately;
    * ``wait`` — a callable joining the drain thread; it merges the fetch
      timings into ``paths["timings"]`` and must be called before reading
      ``paths["features"]`` from disk.

    Rationale: the remote-TPU tunnel has measured 0.4-23 MB/s windows
    (docs/DESIGN.md "tunnel bandwidth"), so the ~135 MB sparse feature fetch
    costs 6-300 s — all hideable behind the downstream U-Net + MPM stages,
    which consume the features from device memory, not from the npy.
    """
    output_path = str(output_path)
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    min_bounds = tuple(b[0] for b in bounds)
    max_bounds = tuple(b[1] for b in bounds)
    grid = dense_voxel_grid(min_bounds, max_bounds, voxel_size)
    shape = grid.shape[:-1]
    if expected_grid is not None:
        # hard grid assert (voxelize.py:301): learning path requires 64^3
        assert shape == (expected_grid,) * 3, (
            f"voxel grid shape {shape} != {(expected_grid,)*3}; "
            f"adjust bounds/voxel_size"
        )
    flat = grid.reshape(-1, 3)
    total = flat.shape[0]
    timings: dict[str, float] = {}

    # pay the remote tunnel's ~60 s first-fetch handshake NOW, on a
    # 1-element array with an idle tunnel — if the alphas fetch below is
    # the process's first device->host transfer it stalls 103-720 s
    # instead (r4g measurement, docs/DESIGN.md "first-fetch handshake")
    from pixie_tpu.utils.device import warm_transfer  # noqa: PLC0415
    timings["tunnel_warm_s"] = warm_transfer()

    # every query runs at EXACTLY (batch_size, 3): ragged tails (and the old
    # 1-point feat-dim probe) are padded — each distinct shape costs a fresh
    # multi-minute remote TPU compile (r3: voxelize 645 s of a 1002 s
    # pipeline, dominated by shape-chasing compiles; docs/DESIGN.md r4)
    # sparse fetch (default ON): the remote tunnel moves ~2-4 MB/s, so the
    # dense (64^3, 768) fp16 feature grid costs minutes to fetch while only
    # ~6% of voxels pass the occupancy alpha cut.  Fetch alphas/rgb dense
    # (2 MB), then gather ONLY rows with alpha > alpha_threshold on device
    # and zero-fill the rest host-side.  Deviation from the reference
    # artifact: sub-threshold background features are exact zeros instead
    # of alpha-weighted ~1e-4 values — those voxels are below the mask's
    # own alpha cut and excluded from training/inference loss anyway.
    sparse_fetch = os.environ.get("PIXIE_VOX_SPARSE_FETCH", "1") == "1"
    if async_fetch is None:
        # default ON since r5: the fetch drain is fully hidden behind the
        # downstream stages and wait() now re-raises drain failures
        async_fetch = os.environ.get("PIXIE_VOX_ASYNC_FETCH", "1") == "1"
    async_fetch = async_fetch and sparse_fetch

    # packed fast path (default when the field supports it): ONE jitted
    # scan over all chunks instead of ~3 programs per 4096-point batch —
    # the per-program remote-dispatch tax, not bandwidth, was 35-95 s of
    # the r4e voxelize stage (docs/DESIGN.md).  Fallback loop serves
    # duck-typed numpy fields (tests) and PIXIE_VOX_PACKED=0.
    packed = getattr(field, "query_packed_chunks", None)
    use_packed = (packed is not None
                  and os.environ.get("PIXIE_VOX_PACKED", "1") == "1")
    fd = a_dev = None
    feats_np: list = []
    t_fetch = 0.0
    if use_packed:
        t0 = time.perf_counter()
        fd_pad, ar_dev = packed(
            flat, batch_size, np.float32(voxel_size), alpha_weighted)
        timings["query_s"] = time.perf_counter() - t0  # dispatch only
        t0 = time.perf_counter()
        # ONE ~2 MB fetch; synchronizes the whole grid's device compute
        ar = np.asarray(ar_dev)[:total]
        alphas = ar[:, :1].reshape(*shape, 1)
        rgb = ar[:, 1:].reshape(*shape, 3)
        timings["alphas_rgb_fetch_s"] = time.perf_counter() - t0
        t_fetch += timings["alphas_rgb_fetch_s"]
        fd = fd_pad if fd_pad.shape[0] == total else fd_pad[:total]
        a_dev = ar_dev[:, :1] if ar_dev.shape[0] == total \
            else ar_dev[:total, :1]
        if not sparse_fetch:
            t0 = time.perf_counter()
            feats_np.append(np.asarray(fd))
            t_fetch += time.perf_counter() - t0
    else:
        feats_dev, alphas_dev, rgb_dev = [], [], []
        t_query = 0.0
        for i in range(0, total, batch_size):
            batch = flat[i : i + batch_size]
            bn = batch.shape[0]
            if bn != batch_size:
                batch = np.concatenate(
                    [batch, np.zeros((batch_size - bn, 3), np.float32)],
                    axis=0)
            t0 = time.perf_counter()
            out = field.query(batch)
            rgb_b = field.get_rgb(batch)
            f16, a16, r16 = _pack_batch(
                out["density"], out["feature"], rgb_b,
                np.float32(voxel_size), alpha_weighted)
            f16.block_until_ready()
            t_query += time.perf_counter() - t0
            t0 = time.perf_counter()
            if sparse_fetch:
                feats_dev.append(f16[:bn] if bn != batch_size else f16)
            else:
                feats_np.append(np.asarray(f16)[:bn])
            # alphas/rgb stay on device; ONE concatenated fetch after the
            # loop (per-batch round-trips cost minutes in a slow window)
            alphas_dev.append(a16[:bn] if bn != batch_size else a16)
            rgb_dev.append(r16[:bn] if bn != batch_size else r16)
            t_fetch += time.perf_counter() - t0
        timings["query_s"] = t_query

        t0 = time.perf_counter()
        a_dev = jnp.concatenate(alphas_dev, axis=0)  # (total, 1) fp16
        alphas = np.asarray(a_dev).reshape(*shape, 1)
        rgb = np.asarray(jnp.concatenate(rgb_dev, axis=0)).reshape(*shape, 3)
        timings["alphas_rgb_fetch_s"] = time.perf_counter() - t0
        t_fetch += timings["alphas_rgb_fetch_s"]
        if sparse_fetch:
            fd = jnp.concatenate(feats_dev, axis=0)  # (total, C) fp16

    features_dev = None
    drain_thread = None
    drain_timings: dict[str, float] = {}
    feat_npy_path = output_path.replace(".npz", "_features.npy")
    if sparse_fetch:
        t0 = time.perf_counter()
        keep = np.flatnonzero(
            alphas.reshape(-1).astype(np.float32) > alpha_threshold_for_mask)
        feat_dim = int(fd.shape[-1])
        parts: list = []
        if len(keep):
            # gather in FIXED-size chunks: one compiled gather program is
            # reused for every chunk and every asset (occupancy drift never
            # recompiles), and padding waste is < one chunk (the previous
            # pow2 bucketing padded 87,655 rows to 131,072)
            ck = 16384
            npad = (len(keep) + ck - 1) // ck * ck
            idx = np.zeros(npad, np.int64)
            idx[: len(keep)] = keep
            # dispatch every chunk gather before fetching any (pipelined:
            # the remote runtime overlaps compute with the host round-trip)
            parts = [jnp.take(fd, jnp.asarray(idx[i:i + ck]), axis=0)
                     for i in range(0, npad, ck)]

        drain_err: list[BaseException] = []

        def _drain_and_save():
            # atomic write: a reader never sees a partial npy, and any
            # failure is re-raised from wait() instead of being swallowed
            # with the pipeline logging success (ADVICE r4)
            try:
                td = time.perf_counter()
                feats = np.zeros((total, feat_dim), np.float16)
                if parts:
                    rows = np.concatenate(
                        [np.asarray(p) for p in parts], axis=0)
                    feats[keep] = rows[: len(keep)]
                drain_timings["fetch_bg_s"] = time.perf_counter() - td
                td = time.perf_counter()
                tmp = feat_npy_path + ".tmp"
                with open(tmp, "wb") as f:
                    np.save(f, feats.reshape(*shape, feat_dim))
                os.replace(tmp, feat_npy_path)
                drain_timings["save_feat_s"] = time.perf_counter() - td
            except BaseException as e:  # noqa: BLE001 — re-raised in wait()
                drain_err.append(e)
                raise

        if async_fetch:
            # the HOST artifact zero-fills sub-threshold rows; mirror that
            # on device so features_dev and the npy carry identical values
            # (jnp.where keeps +0.0, matching np.zeros fill)
            keep_dev = (
                a_dev.astype(jnp.float32) > alpha_threshold_for_mask
            )  # (total, 1)
            features_dev = jnp.where(
                keep_dev, fd, jnp.float16(0.0)).reshape(*shape, feat_dim)
            drain_thread = threading.Thread(
                target=_drain_and_save, name="vox-feat-drain")
            drain_thread.start()
            features = None
            timings["gather_dispatch_s"] = time.perf_counter() - t0
            timings["fetch_s"] = t_fetch + (time.perf_counter() - t0)
        else:
            _drain_and_save()
            features = None  # npy already written by _drain_and_save
            timings["fetch_s"] = (
                t_fetch + (time.perf_counter() - t0)
                - drain_timings["save_feat_s"])
            timings["save_feat_s"] = drain_timings["save_feat_s"]
        timings["sparse_rows"] = float(len(keep))
        feat_shape = (*shape, feat_dim)
    else:
        timings["fetch_s"] = t_fetch
        features = np.concatenate(feats_np).reshape(*shape, -1)
        feat_shape = features.shape

    t0 = time.perf_counter()
    paths = save_voxel_data(
        output_path, features, alphas, rgb, min_bounds, max_bounds, voxel_size,
        alpha_weighted, alpha_threshold_for_mask, feat_shape=feat_shape,
    )
    timings["save_s"] = time.perf_counter() - t0

    mask = create_occupancy_mask(
        grid, alphas, rgb, alpha_threshold_for_mask, gray_threshold_for_mask,
        run_outlier_filter, nb_neighbors, std_ratio, min_cluster_pts,
        eps_multiplier, voxel_size, timings=timings,
    )
    mask_path = output_path.replace(".npz", "_mask.npy")
    np.save(mask_path, mask.astype(np.float32))
    paths["mask"] = mask_path
    paths["timings"] = timings
    logging.info("voxelize breakdown: %s",
                 {k: round(v, 2) for k, v in timings.items()})

    # occupancy point cloud for inspection (voxelize.py:266-406)
    pc_path = output_path.replace(".npz", "_pc.ply")
    coords = grid.reshape(-1, 3)[mask.reshape(-1)]
    colors = (np.clip(rgb.reshape(-1, 3)[mask.reshape(-1)].astype(np.float32), 0, 1) * 255).astype(np.uint8)
    vertex = np.zeros(len(coords), dtype=[
        ("x", "f4"), ("y", "f4"), ("z", "f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1"),
    ])
    vertex["x"], vertex["y"], vertex["z"] = coords.T
    vertex["red"], vertex["green"], vertex["blue"] = colors.T
    write_ply(pc_path, vertex)
    paths["pc_ply"] = pc_path

    if drain_thread is not None:
        paths["features_dev"] = features_dev

        def _wait() -> dict:
            drain_thread.join()
            if drain_err:
                raise RuntimeError(
                    f"voxel feature drain failed; {feat_npy_path} was NOT "
                    f"written") from drain_err[0]
            timings.update(drain_timings)
            return timings

        paths["wait"] = _wait

    logging.info(
        "Voxelization done: %d/%d occupied voxels", int(mask.sum()), mask.size
    )
    return paths


def save_voxel_data(
    output_path, features, alphas, rgb, min_bounds, max_bounds, voxel_size,
    alpha_weighted, alpha_threshold, feat_shape=None,
) -> dict:
    """Write the npz metadata + sidecar npy arrays (voxelize.py:144-185).

    ``features=None`` (sparse-fetch path): the ``*_features.npy`` sidecar is
    written separately by the fetch drain — possibly still in flight on a
    background thread — and ``feat_shape`` supplies the npz metadata."""
    base = output_path.replace(".npz", "")
    paths = {
        "npz": output_path,
        "features": f"{base}_features.npy",
        "alphas": f"{base}_alphas.npy",
        "rgb": f"{base}_rgb.npy",
    }
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    if features is not None:
        np.save(paths["features"], features)
        feat_shape = features.shape
    np.save(paths["alphas"], alphas)
    np.save(paths["rgb"], rgb)
    np.savez(
        output_path,
        min_bounds=np.asarray(min_bounds, np.float32),
        max_bounds=np.asarray(max_bounds, np.float32),
        voxel_size=np.float32(voxel_size),
        grid_shape=np.asarray(feat_shape[:-1]),
        feature_dim=feat_shape[-1],
        alpha_weighted=alpha_weighted,
        alpha_threshold=alpha_threshold,
    )
    return paths
