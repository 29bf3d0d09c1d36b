"""CLIP text-query part segmentation of the voxel grid (VLM labeling path).

Port of pixie/voxel/segmentation.py: masked voxel CLIP features dotted with
normalized text embeddings of the part queries -> softmax(T=0.1) -> argmax
part label (run_clip:98-122, clip_part_segmentation:125-183); per-part
material properties assigned from the sampled material_dict; writes
segmented_semantics.ply and the dense material_grid.npy labels
(save_segmented_point_cloud:231-472: background voxels get density=E=nu=0
and material_id=background_id, foreground filled via the occupancy mask's
flat indices in C order).

Text encoding is pluggable: pass precomputed embeddings or an encoder
callable (a CLIP text tower; the reference hardcodes ViT-L/14@336px,
features/clip_extract.py:12).  Offline environments use cached embeddings.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from pixie_tpu.sim.types import get_material_id
from pixie_tpu.utils.io import MATERIAL_PLY_DTYPE, write_ply


def run_clip_similarity(
    features: np.ndarray, query_embs: np.ndarray, softmax_temperature: float = 0.1
):
    """(N,C) voxel features x (Q,C) text embeddings -> probabilities (N,Q).

    Both sides L2-normalized; softmax over queries at T=0.1
    (segmentation.py:98-122)."""
    import jax  # noqa: PLC0415

    f = jnp.asarray(features, jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
    q = jnp.asarray(query_embs, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    sims = f @ q.T
    probs = jax.nn.softmax(sims / softmax_temperature, axis=1)
    return np.asarray(probs), np.asarray(sims)


def encode_queries(queries, text_encoder=None, query_embs=None) -> np.ndarray:
    """Resolve text embeddings: precomputed array, a callable encoder, or a
    cached-embedding lookup."""
    if query_embs is not None:
        return np.asarray(query_embs, np.float32)
    if text_encoder is not None:
        return np.asarray(text_encoder(list(queries)), np.float32)
    raise ValueError(
        "No CLIP text encoder available: pass query_embs (precomputed) or "
        "text_encoder (callable)."
    )


def clip_part_segmentation(
    grid_feature_path: str | Path,
    part_queries: list[str],
    text_encoder=None,
    query_embs=None,
    softmax_temperature: float = 0.1,
):
    """Masked voxels -> (coords, part_labels, part_scores, metrics)."""
    grid_feature_path = str(grid_feature_path)
    features = np.load(grid_feature_path.replace(".npz", "_features.npy"))
    mask_path = grid_feature_path.replace(".npz", "_mask.npy")
    mask = np.load(mask_path).astype(bool)
    meta = np.load(grid_feature_path)
    min_bounds, max_bounds = meta["min_bounds"], meta["max_bounds"]
    grid_shape = tuple(int(v) for v in meta["grid_shape"])

    axes = [np.linspace(min_bounds[i], max_bounds[i], grid_shape[i], endpoint=False)
            for i in range(3)]
    # the reference grid uses arange(min, max, voxel_size) == endpoint=False
    coords = np.stack(np.meshgrid(*axes, indexing="ij"), -1)

    feats_flat = features.reshape(-1, features.shape[-1])[mask.ravel()]
    coords_flat = coords.reshape(-1, 3)[mask.ravel()]

    embs = encode_queries(part_queries, text_encoder, query_embs)
    probs, _ = run_clip_similarity(feats_flat, embs, softmax_temperature)
    part_labels = probs.argmax(1)
    part_scores = probs[np.arange(len(probs)), part_labels]

    metrics = {"num_parts": len(part_queries), "num_voxels": len(coords_flat)}
    for i, query in enumerate(part_queries):
        metrics[f"part_{i}_{query}"] = int((part_labels == i).sum())
        logging.info("Part %d (%s): %d voxels", i, query, metrics[f"part_{i}_{query}"])
    return coords_flat, part_labels, part_scores, metrics


def local_post_process_segmentation(
    coords: np.ndarray, part_labels: np.ndarray, k: int = 200, chunk: int = 4096
) -> np.ndarray:
    """k-NN majority-vote label smoothing (segmentation.py:190-229).

    The reference loops a sklearn KDTree query per point; here the whole vote
    is three MXU contractions per chunk: a squared-distance matrix
    (|q|^2+|p|^2-2 q.p), a top-k threshold per row, and a neighbor-mask x
    one-hot-label matmul giving per-class counts.  Ties at the k-th distance
    include all equidistant neighbors (vote unchanged in the generic case);
    class ties break to the smallest label, matching scipy.stats.mode.
    """
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    n = len(coords)
    k = min(k, n)
    labels = np.asarray(part_labels)
    num_classes = int(labels.max()) + 1
    pts = jnp.asarray(coords, jnp.float32)
    onehot = jax.nn.one_hot(jnp.asarray(labels), num_classes, dtype=jnp.float32)
    p_sq = (pts * pts).sum(-1)

    @jax.jit
    def vote(q):
        d = (q * q).sum(-1, keepdims=True) + p_sq[None, :] - 2.0 * q @ pts.T
        kth = -jax.lax.top_k(-d, k)[0][:, -1:]
        mask = (d <= kth).astype(jnp.float32)
        counts = mask @ onehot
        return jnp.argmax(counts, axis=1)

    out = np.empty(n, labels.dtype)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        q = jnp.zeros((chunk, 3), jnp.float32).at[: e - s].set(pts[s:e])
        out[s:e] = np.asarray(vote(q))[: e - s]
    return out


def connected_component_cleanup(
    coords: np.ndarray, part_labels: np.ndarray, radius: float = 0.05
) -> np.ndarray:
    """Keep only the largest connected component per label; relabel smaller
    islands to -1 (segmentation.py:592-630 connected_component_cleanup +
    reassign_small_components).

    Adjacency = point pairs within ``radius`` sharing a label; components via
    scipy's sparse graph machinery instead of the reference's per-point BFS.
    Host-side: runs once per object on <=64^3 occupied voxels.
    """
    from scipy import sparse  # noqa: PLC0415
    from scipy.spatial import cKDTree  # noqa: PLC0415

    labels = np.asarray(part_labels).copy()
    n = len(labels)
    if n == 0:
        return labels
    pairs = cKDTree(coords).query_pairs(radius, output_type="ndarray")
    if len(pairs):
        same = labels[pairs[:, 0]] == labels[pairs[:, 1]]
        pairs = pairs[same]
    row = np.concatenate([pairs[:, 0], pairs[:, 1]])
    col = np.concatenate([pairs[:, 1], pairs[:, 0]])
    adj = sparse.coo_matrix(
        (np.ones(len(row), np.int8), (row, col)), shape=(n, n)
    ).tocsr()
    n_comp, comp = sparse.csgraph.connected_components(adj, directed=False)
    for lbl in np.unique(labels):
        comp_ids, counts = np.unique(comp[labels == lbl], return_counts=True)
        if len(comp_ids) <= 1:
            continue
        keep = comp_ids[np.argmax(counts)]
        islands = (labels == lbl) & (comp != keep)
        labels[islands] = -1
    return labels


def save_segmented_point_cloud(
    coords: np.ndarray,
    part_labels: np.ndarray,
    part_scores: np.ndarray,
    material_dict: dict,
    part_queries: list[str],
    output_dir: str | Path,
    grid_feature_path: str | Path | None = None,
    background_id: int = 7,
):
    """Write segmented_semantics.ply + material_grid.npy
    (segmentation.py:231-472 semantics)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    n = len(coords)

    density = np.zeros(n, np.float32)
    E = np.zeros(n, np.float32)
    nu = np.zeros(n, np.float32)
    material_id = np.zeros(n, np.int64)
    for i, query in enumerate(part_queries):
        props = material_dict[query]
        sel = part_labels == i
        density[sel] = props["density"]
        E[sel] = props["E"]
        nu[sel] = props["nu"]
        mid = props["material_id"]
        material_id[sel] = get_material_id(mid) if isinstance(mid, str) else int(mid)

    vertex = np.zeros(n, dtype=MATERIAL_PLY_DTYPE)
    vertex["x"], vertex["y"], vertex["z"] = coords.T
    vertex["red"] = vertex["green"] = vertex["blue"] = vertex["alpha"] = 255
    vertex["part_label"] = part_labels
    vertex["density"], vertex["E"], vertex["nu"] = density, E, nu
    vertex["material_id"] = material_id
    vertex["conf"] = part_scores
    ply_path = output_dir / "segmented_semantics.ply"
    write_ply(ply_path, vertex)

    material_grid_path = None
    if grid_feature_path is not None:
        meta = np.load(grid_feature_path)
        grid_shape = tuple(int(v) for v in meta["grid_shape"])
        material_grid = np.zeros((*grid_shape, 4), np.float32)
        material_grid[..., 3] = background_id

        mask_path = str(grid_feature_path).replace(".npz", "_mask.npy")
        assert os.path.exists(mask_path), f"Mask not found: {mask_path}"
        mask = np.load(mask_path).astype(bool)
        flat_idx = np.flatnonzero(mask.ravel(order="C"))
        assert len(flat_idx) == n, (
            f"Mask/coords length mismatch: mask has {len(flat_idx)} true "
            f"voxels, coords has {n} points."
        )
        mg = material_grid.reshape(-1, 4)
        mg[flat_idx, 0] = density
        mg[flat_idx, 1] = E
        mg[flat_idx, 2] = nu
        mg[flat_idx, 3] = material_id
        material_grid_path = output_dir / "material_grid.npy"
        np.save(material_grid_path, material_grid)
        for name, ch in (("density_grid", 0), ("E_grid", 1), ("nu_grid", 2),
                         ("material_id_grid", 3)):
            np.save(output_dir / f"{name}.npy", material_grid[..., ch])

    return str(ply_path), (str(material_grid_path) if material_grid_path else None)


def generate_material_segmentation(
    grid_feature_path: str | Path,
    vlm_results: dict,
    output_dir: str | Path,
    text_encoder=None,
    query_embs=None,
    softmax_temperature: float = 0.1,
    background_id: int = 7,
    use_spatial_smoothing: bool = False,
):
    """VLM results (material_dict keyed by query terms) -> labeled artifacts
    (the generate_material_segmentation flow, pixie/utils.py:629-723)."""
    part_queries = list(vlm_results["material_dict"].keys())
    coords, labels, scores, metrics = clip_part_segmentation(
        grid_feature_path, part_queries, text_encoder, query_embs,
        softmax_temperature,
    )
    if use_spatial_smoothing:
        # reference segmentation.py:662-664 (--use_spatial_smoothing)
        labels = local_post_process_segmentation(coords, labels)
    ply, grid = save_segmented_point_cloud(
        coords, labels, scores, vlm_results["material_dict"], part_queries,
        output_dir, grid_feature_path, background_id,
    )
    return {"ply": ply, "material_grid": grid, "metrics": metrics}
