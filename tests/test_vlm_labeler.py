"""VLM labeling chain tests with the mock backend (offline-safe)."""

import json
from pathlib import Path

import numpy as np
import pytest

from pixie_tpu.vlm_labeler.agent import Agent, AgentConfig, MockVLM, parse_json_block
from pixie_tpu.vlm_labeler.stages import (
    MathSamplerAgent,
    SegmentationAgent,
    SegmentationCriticAgent,
    evaluate_constraint,
    merge_best_query,
    rejection_sample,
)


class TestParseJson:
    def test_fenced_json(self):
        out = parse_json_block('Here you go:\n```json\n{"a": 1}\n```\nthanks')
        assert out == {"a": 1}

    def test_nested_braces(self):
        out = parse_json_block('{"a": {"b": [1, 2]}} trailing')
        assert out == {"a": {"b": [1, 2]}}

    def test_no_json_raises(self):
        with pytest.raises(ValueError):
            parse_json_block("no json here")


SEG_RESPONSE = json.dumps({
    "material_dict": {
        "trunk": {"density": [300, 800], "E": [1e6, 1e8], "nu": [0.3, 0.4],
                  "material_id": 0},
        "leaves": {"density": [50, 200], "E": [1e4, 1e5], "nu": [0.25, 0.35],
                   "material_id": 0},
    },
    "reasoning": "wood is stiffer than foliage",
    "constraints": 'assert material_dict["trunk"]["E"] > material_dict["leaves"]["E"]',
    "all_queries": [["tree trunk", "tree leaves"], ["bark", "foliage"]],
})


class TestSegmentationAgent:
    def test_generates_and_caches(self, tmp_path):
        backend = MockVLM([SEG_RESPONSE])
        agent = SegmentationAgent(
            AgentConfig("mock", str(tmp_path)), obj_class="tree", backend=backend
        )
        result = agent.generate_prediction(["<img>"])
        assert "trunk" in result["material_dict"]
        assert len(backend.calls) == 1
        # cached: second call must not hit the backend
        result2 = agent.generate_prediction(["<img>"])
        assert len(backend.calls) == 1
        assert result2 == result

    def test_missing_keys_raise(self, tmp_path):
        backend = MockVLM(['{"material_dict": {}}'])
        agent = SegmentationAgent(
            AgentConfig("mock", str(tmp_path)), obj_class="tree", backend=backend
        )
        with pytest.raises(ValueError, match="all_queries"):
            agent.generate_prediction(["<img>"])

    def test_system_instruction_mentions_class_and_materials(self, tmp_path):
        agent = SegmentationAgent(
            AgentConfig("mock", str(tmp_path)), obj_class="chair", backend=MockVLM()
        )
        assert "chair" in agent.system_instruction
        assert "jelly" in agent.system_instruction
        assert "stationary" in agent.system_instruction


class TestSampler:
    def test_constraint_evaluation(self):
        md = {"a": {"E": 10}, "b": {"E": 5}}
        assert evaluate_constraint(
            'assert material_dict["a"]["E"] > material_dict["b"]["E"]', md
        )
        assert not evaluate_constraint(
            'assert material_dict["a"]["E"] < material_dict["b"]["E"]', md
        )
        assert evaluate_constraint("```python\nassert True\n```", md)
        assert evaluate_constraint("", md)  # empty constraints pass

    def test_rejection_sampling_respects_ranges_and_constraints(self):
        ranges = {
            "hard": {"density": [500, 600], "E": [1e6, 1e7], "nu": [0.3, 0.4],
                     "material_id": 1},
            "soft": {"density": [100, 200], "E": [1e4, 1e5], "nu": [0.2, 0.3],
                     "material_id": 0},
        }
        constraints = (
            'assert material_dict["hard"]["E"] > material_dict["soft"]["E"]'
        )
        out = rejection_sample(ranges, constraints, seed=0)
        hard, soft = out["material_dict"]["hard"], out["material_dict"]["soft"]
        assert 500 <= hard["density"] <= 600
        assert hard["E"] > soft["E"]
        assert hard["material_id"] == 1
        assert out["sampling_attempts"] >= 1

    def test_impossible_constraints_raise(self):
        ranges = {"x": {"density": [1, 2], "E": [1, 2], "nu": [0.1, 0.2],
                        "material_id": 0}}
        with pytest.raises(RuntimeError, match="Failed to find valid sample"):
            rejection_sample(ranges, "assert False", max_attempts=5)

    def test_sampler_agent_caches(self, tmp_path):
        seg = json.loads(SEG_RESPONSE)
        src = tmp_path / "seg.json"
        src.write_text(json.dumps(seg))
        agent = MathSamplerAgent(AgentConfig("mock", str(tmp_path / "s0")))
        out1 = agent.generate_prediction(str(src), seed=0)
        out2 = agent.generate_prediction(str(src), seed=1)  # cached
        assert out1 == out2


class TestMergeBestQuery:
    def test_merge_renames_parts(self):
        seg = json.loads(SEG_RESPONSE)
        draw = rejection_sample(seg["material_dict"], seg["constraints"], seed=0)
        merged = merge_best_query(draw, seg, 1)
        assert set(merged["material_dict"].keys()) == {"bark", "foliage"}
        assert merged["best_query"] == ["bark", "foliage"]

    def test_length_mismatch_raises(self):
        seg = json.loads(SEG_RESPONSE)
        seg["all_queries"] = [["only_one"]]
        draw = rejection_sample(seg["material_dict"], "", seed=0)
        with pytest.raises(ValueError, match="terms"):
            merge_best_query(draw, seg, 0)


class TestClipSegmentation:
    def test_text_query_segmentation_with_precomputed_embeddings(self, tmp_path, rng):
        """Synthetic feature grid with two separable clusters."""
        from pixie_tpu.voxel.segmentation import generate_material_segmentation
        from pixie_tpu.utils.io import read_ply

        d, c = 8, 6
        feats = np.zeros((d, d, d, c), np.float16)
        mask = np.zeros((d, d, d), np.float32)
        # lower half: direction e0; upper half: direction e1
        feats[:, :, : d // 2, 0] = 1.0
        feats[:, :, d // 2 :, 1] = 1.0
        mask[2:6, 2:6, :] = 1.0

        base = tmp_path / "clip_features"
        np.save(str(base) + "_features.npy", feats)
        np.save(str(base) + "_mask.npy", mask)
        np.savez(
            str(base) + ".npz",
            min_bounds=np.array([-0.5] * 3, np.float32),
            max_bounds=np.array([0.5] * 3, np.float32),
            grid_shape=np.array([d, d, d]),
            voxel_size=np.float32(1.0 / d),
        )

        vlm_results = {
            "material_dict": {
                "bottom": {"density": 500.0, "E": 1e6, "nu": 0.3, "material_id": 1},
                "top": {"density": 100.0, "E": 1e4, "nu": 0.25, "material_id": 0},
            }
        }
        query_embs = np.eye(2, c, dtype=np.float32)  # e0 ~ bottom, e1 ~ top
        out = generate_material_segmentation(
            str(base) + ".npz", vlm_results, tmp_path / "seg_out",
            query_embs=query_embs,
        )
        grid = np.load(out["material_grid"])
        assert grid.shape == (d, d, d, 4)
        # background voxels labeled 7
        assert (grid[0, 0, 0, 3] == 7)
        # bottom-half foreground -> material 1, top-half -> material 0
        assert (grid[3, 3, 1, 3] == 1) and (grid[3, 3, 6, 3] == 0)
        assert grid[3, 3, 1, 0] == 500.0
        v = read_ply(out["ply"])["vertex"]
        assert len(v) == int(mask.sum())
        assert set(np.unique(v["material_id"])) <= {0, 1}


class TestClassInstructions:
    """Per-class few-shot instruction library
    (reference vlm_seg_class_instruction.py:15-374)."""

    def test_all_eleven_classes_present(self):
        from pixie_tpu.vlm_labeler.class_instructions import INSTRUCTION_CONFIGS

        assert set(INSTRUCTION_CONFIGS) == {
            "tree", "flowers", "shrub", "grass", "rubber_ducks_and_toys",
            "sport_balls", "soda_cans", "metal_crates", "sand",
            "jello_block", "snow_and_mud",
        }

    def test_generate_instruction_renders_payload(self):
        from pixie_tpu.vlm_labeler.class_instructions import generate_instruction

        text = generate_instruction("tree", 2)
        # curated example values and queries appear in the rendered prompt
        assert '"pot"' in text and '"trunk"' in text and '"leaves"' in text
        assert "reddish-brown" in text
        assert 'material_dict["leaves"]["E"] < material_dict["trunk"]["E"]' in text
        assert "2 alternative queries" in text
        # material id legend rendered from the solver's table
        assert '"jelly"' in text and '"stationary"' in text

    def test_single_part_classes_forbid_segmentation(self):
        from pixie_tpu.vlm_labeler.class_instructions import (
            INSTRUCTION_CONFIGS,
            generate_instruction,
        )

        for cls in ("soda_cans", "sport_balls", "jello_block", "sand",
                    "metal_crates", "rubber_ducks_and_toys", "snow_and_mud"):
            cfg = INSTRUCTION_CONFIGS[cls]
            assert len(cfg.example_material_dict) == 1
            assert "ONE" in generate_instruction(cls, 3)

    def test_material_ids_match_solver_table(self):
        from pixie_tpu.sim.types import get_material_id
        from pixie_tpu.vlm_labeler.class_instructions import INSTRUCTION_CONFIGS

        assert (INSTRUCTION_CONFIGS["soda_cans"].example_material_dict["can"]
                ["material_id"] == get_material_id("metal"))
        assert (INSTRUCTION_CONFIGS["sand"].example_material_dict["sand"]
                ["material_id"] == get_material_id("sand"))
        assert (INSTRUCTION_CONFIGS["snow_and_mud"].example_material_dict
                ["snow_and_mud"]["material_id"] == get_material_id("snow"))
        assert (INSTRUCTION_CONFIGS["tree"].example_material_dict["pot"]
                ["material_id"] == get_material_id("stationary"))

    def test_agent_uses_class_library_when_available(self, tmp_path):
        agent = SegmentationAgent(
            AgentConfig("mock", str(tmp_path)), obj_class="tree",
            num_alternative_queries=4, backend=MockVLM(),
        )
        assert "ficus tree" in agent.system_instruction
        assert "4 alternative queries" in agent.system_instruction
        # non-curated classes fall back to the generic instruction
        generic = SegmentationAgent(
            AgentConfig("mock", str(tmp_path / "g")), obj_class="chair",
            backend=MockVLM(),
        )
        assert "chair" in generic.system_instruction


class TestVizSegCandidates:
    """Stage-2 candidate viz: fine re-voxelization fallback + heatmaps
    (reference vlm_viz_seg_candidates.py:10-73)."""

    def _fixture(self, tmp_path):
        rng = np.random.default_rng(0)
        render_out = tmp_path / "render_outputs" / "obj"
        render_out.mkdir(parents=True)
        feats = rng.normal(size=(8, 8, 8, 16)).astype(np.float16)
        np.save(render_out / "clip_features_features.npy", feats)
        mask = np.zeros((8, 8, 8), np.float32)
        mask[2:6, 2:6, 2:6] = 1
        np.save(render_out / "clip_features_mask.npy", mask)
        np.savez(render_out / "clip_features.npz",
                 min_bounds=np.zeros(3, np.float32),
                 max_bounds=np.ones(3, np.float32),
                 voxel_size=np.float32(1 / 8))
        return {
            "render_output": str(render_out),
            "nerf_output": str(tmp_path / "outputs" / "obj" / "f3rm"),
            "vlm_base_dir": str(tmp_path / "vlm" / "obj"),
        }

    def test_heatmaps_rendered_per_candidate(self, tmp_path):
        from pixie_tpu.vlm_labeler.chain import viz_seg_candidates

        paths = self._fixture(tmp_path)
        rng = np.random.default_rng(1)
        enc = lambda qs: rng.normal(size=(len(qs), 16)).astype(np.float32)
        out = viz_seg_candidates(
            paths, [["leg", "seat"], ["frame", "cushion", "base"]],
            text_encoder=enc,
        )
        assert set(out) == {0, 1}
        assert len(out[0]) == 2 and len(out[1]) == 3
        for p in out[0] + out[1]:
            assert Path(p).exists()
        assert "query_0" in out[0][0] and "query_1" in out[1][0]

    def test_no_encoder_skips_gracefully(self, tmp_path):
        from pixie_tpu.vlm_labeler.chain import viz_seg_candidates

        paths = self._fixture(tmp_path)
        assert viz_seg_candidates(paths, [["a"]]) == {}

    def test_no_features_skips_gracefully(self, tmp_path):
        from pixie_tpu.vlm_labeler.chain import viz_seg_candidates

        paths = {
            "render_output": str(tmp_path / "nothing"),
            "nerf_output": str(tmp_path / "nothing"),
            "vlm_base_dir": str(tmp_path / "vlm"),
        }
        assert viz_seg_candidates(paths, [["a"]]) == {}
