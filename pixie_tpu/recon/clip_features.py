"""Dense CLIP patch-feature extraction for feature-field distillation.

Reference: f3rm/features/clip_extract.py:11-89 (``CLIPArgs`` /
``extract_clip_features``): ViT-L/14@336px dense patch embeddings per image
(768-d), center-crop skipped, cached to disk; the datamanager then
NN-interpolates per ray (feature_datamanager.py:106-124 — that lookup lives
in recon/train_field.make_ray_fn here).

Implementation: HuggingFace transformers CLIPVisionModel (weights must be
available locally — this environment has no network egress, so extraction is
gated; precomputed feature files are the supported offline path).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np


class CLIPArgs:
    model_name: str = "openai/clip-vit-large-patch14-336"
    patch_size: int = 14
    feature_dim: int = 768


def extract_clip_features(
    image_paths: list[str | Path],
    cache_path: str | Path | None = None,
    model_name: str = CLIPArgs.model_name,
    batch_size: int = 4,
    device: str = "cpu",
    backend: str = "jax",
) -> np.ndarray:
    """Images -> (N, Hp, Wp, 768) dense patch features (pre-projection
    hidden states, as f3rm uses).

    backend="jax" (default): torch only loads the weights; the tower runs
    as the flax CLIPVisionTower (recon/clip_jax.py) on the default JAX
    device — the TPU path.  backend="torch": the HF module end-to-end.
    """
    if cache_path is not None and Path(cache_path).exists():
        logging.info("loading cached CLIP features from %s", cache_path)
        return np.load(cache_path)

    if backend == "jax":
        return _extract_jax(image_paths, cache_path, model_name, batch_size)

    try:
        import torch  # noqa: PLC0415
        from PIL import Image  # noqa: PLC0415
        from transformers import CLIPImageProcessor, CLIPVisionModel  # noqa: PLC0415

        processor = CLIPImageProcessor.from_pretrained(model_name)
        model = CLIPVisionModel.from_pretrained(model_name).to(device).eval()
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"CLIP weights unavailable ({e}); provide precomputed features "
            f"(the voxel pipeline consumes clip_features_features.npy directly)"
        ) from e

    feats = []
    with torch.no_grad():
        for start in range(0, len(image_paths), batch_size):
            imgs = [
                Image.open(p).convert("RGB")
                for p in image_paths[start : start + batch_size]
            ]
            # center-crop skipped (clip_extract.py CLIPArgs): resize only
            inputs = processor(
                images=imgs, return_tensors="pt", do_center_crop=False,
                size={"shortest_edge": 336},
            ).to(device)
            out = model(**inputs).last_hidden_state[:, 1:]  # drop CLS
            b, t, c = out.shape
            side = int(round(t ** 0.5))
            feats.append(out.reshape(b, side, side, c).cpu().numpy())
    features = np.concatenate(feats).astype(np.float16)
    if cache_path is not None:
        Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
        np.save(cache_path, features)
        logging.info("cached CLIP features to %s", cache_path)
    return features


def _extract_jax(image_paths, cache_path, model_name, batch_size):
    """Load HF weights once (torch, CPU), convert, run the flax tower."""
    try:
        import torch  # noqa: PLC0415
        from PIL import Image  # noqa: PLC0415
        from transformers import CLIPVisionModel  # noqa: PLC0415
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"CLIP weights unavailable ({e}); provide precomputed features"
        ) from e
    from pixie_tpu.recon.clip_jax import (  # noqa: PLC0415
        CLIPVisionConfig, convert_clip_vision_state_dict,
        extract_clip_features_jax,
    )

    model = CLIPVisionModel.from_pretrained(model_name)
    hf = model.config
    cfg = CLIPVisionConfig(
        hidden_size=hf.hidden_size, intermediate_size=hf.intermediate_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        patch_size=hf.patch_size, image_size=hf.image_size,
    )
    params = convert_clip_vision_state_dict(model.state_dict(), cfg)
    del model
    torch.cuda.empty_cache() if torch.cuda.is_available() else None

    # resize shortest edge to image_size, snap to patch multiples (center
    # crop skipped — CLIPArgs; rectangular grids handled by pos interp)
    imgs = []
    for p in image_paths:
        im = Image.open(p).convert("RGB")
        w, h = im.size
        s = cfg.image_size / min(w, h)
        nw = max(round(w * s / cfg.patch_size), 1) * cfg.patch_size
        nh = max(round(h * s / cfg.patch_size), 1) * cfg.patch_size
        imgs.append(np.asarray(im.resize((nw, nh), Image.BICUBIC),
                               np.float32) / 255.0)
    stacked = np.stack(imgs)
    feats = extract_clip_features_jax(stacked, params, cfg,
                                      batch_size=batch_size)
    feats = feats.astype(np.float16)
    if cache_path is not None:
        Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
        np.save(cache_path, feats)
    return feats


def encode_text_queries(queries: list[str],
                        model_name: str = "openai/clip-vit-large-patch14-336",
                        device: str = "cpu") -> np.ndarray:
    """Text queries -> (Q, 768) normalized CLIP embeddings (the encoder the
    VLM-path segmentation consumes, segmentation.py run_clip:98-122)."""
    import torch  # noqa: PLC0415
    from transformers import CLIPModel, CLIPTokenizer  # noqa: PLC0415

    tok = CLIPTokenizer.from_pretrained(model_name)
    model = CLIPModel.from_pretrained(model_name).to(device).eval()
    with torch.no_grad():
        inputs = tok(queries, padding=True, return_tensors="pt").to(device)
        emb = model.get_text_features(**inputs)
        emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.cpu().numpy().astype(np.float32)
