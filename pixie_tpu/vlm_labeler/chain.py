"""VLM labeling chain orchestration (the material_mode=vlm path).

Reference flow (pipeline.py:482-496): vlm_seg -> viz candidates ->
seg critic -> phys sampler (one sample_i per draw) -> parse critic ->
CLIP part segmentation producing segmented_semantics.ply + material_grid.npy
(the U-Net training labels).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from pixie_tpu.vlm_labeler.agent import AgentConfig
from pixie_tpu.vlm_labeler.stages import (
    MathSamplerAgent,
    SegmentationAgent,
    SegmentationCriticAgent,
    merge_best_query,
    rejection_sample,
)


def load_training_views(data_dir: str | Path, n_views: int = 15, seed: int = 0):
    """Sample rendered training views for the VLM prompts (vlm_seg.py:16-59)."""
    from PIL import Image  # noqa: PLC0415

    pngs = sorted(Path(data_dir).glob("*.png"))
    if not pngs:
        raise FileNotFoundError(f"no rendered views in {data_dir}")
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(pngs), min(n_views, len(pngs)), replace=False)
    return [Image.open(pngs[i]).convert("RGB") for i in picks]


def run_vlm_labeling_chain(
    cfg,
    paths: dict,
    backend=None,
    n_samples: int = 3,
    text_encoder=None,
    query_embs=None,
):
    """Run stages 1-5 + CLIP segmentation; returns the material PLY path of
    sample_0 (the sim input)."""
    from pixie_tpu.utils.paths import voxel_artifact_paths  # noqa: PLC0415
    from pixie_tpu.voxel.segmentation import generate_material_segmentation  # noqa: PLC0415

    obj_id = cfg.obj_id
    model_name = cfg.get("vlm_model", "gemini-2.0-flash")
    base_dir = Path(paths["vlm_base_dir"])

    # stage 1: propose parts / ranges / constraints / query candidates
    views = load_training_views(paths["data_dir"])
    seg_agent = SegmentationAgent(
        AgentConfig(model_name, str(base_dir / "seg")),
        obj_class=cfg.obj_class or "object", backend=backend,
    )
    seg_result = seg_agent.generate_prediction(views, overwrite=cfg.overwrite)

    # stage 2+3: similarity renders per candidate + critic pick.
    # Offline fallback: first candidate wins when no critic backend.
    try:
        critic = SegmentationCriticAgent(
            AgentConfig(model_name, str(base_dir / "critic")), backend=backend
        )
        critic_result = critic.generate_prediction(
            views, [[] for _ in seg_result["all_queries"]],
            overwrite=cfg.overwrite,
        )
        best_idx = int(critic_result["best_query"])
    except Exception as e:  # noqa: BLE001
        logging.warning("seg critic unavailable (%s); using query set 0", e)
        best_idx = 0

    # stage 4: one rejection-sampled draw per sample dir
    render_out = Path(paths["render_output"])
    material_plys = []
    for k in range(n_samples):
        sample_dir = render_out / f"sample_{k}"
        sample_dir.mkdir(parents=True, exist_ok=True)
        sampler = MathSamplerAgent(
            AgentConfig("mock-sampler", str(base_dir / f"sample_{k}"))
        )
        seg_json = base_dir / "seg" / SegmentationAgent.OUT_RESULT_PATH
        draw = sampler.generate_prediction(
            str(seg_json), overwrite=cfg.overwrite, seed=k
        )

        # stage 5: merge winning query terms into the draw
        chosen = merge_best_query(draw, seg_result, best_idx)
        (sample_dir / "chosen_vlm_results.json").write_text(
            json.dumps(chosen, indent=2)
        )

        # CLIP text segmentation -> PLY + material grid (training labels)
        art = voxel_artifact_paths(str(render_out))
        result = generate_material_segmentation(
            art["npz"], chosen, sample_dir,
            text_encoder=text_encoder, query_embs=query_embs,
            softmax_temperature=cfg.segmentation.softmax_temperature,
            background_id=cfg.training.background_id,
        )
        material_plys.append(result["ply"])

    return material_plys[0]
