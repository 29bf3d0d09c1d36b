"""End-to-end test of the CLIP text-query encoder (recon/clip_features.py)
with a locally-built tiny CLIP model — no network, no pretrained weights.

Covers the path the VLM segmentation consumes (reference
pixie/voxel/segmentation.py run_clip:98-122): tokenizer -> text tower ->
projection -> L2 normalization, via the real HF from_pretrained loading
machinery (a saved local model dir).
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from pixie_tpu.recon.clip_features import encode_text_queries


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPTokenizer, CLIPVisionConfig)

    d = tmp_path_factory.mktemp("tiny_clip")
    # minimal character-level BPE vocab: letters with/without the
    # end-of-word suffix plus the special tokens
    letters = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for ch in letters:
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    tok.save_pretrained(d)

    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77,
            # EOS pooling (get_text_features) matches on these ids; they
            # must agree with the toy vocab or pooling falls back to BOS
            bos_token_id=vocab["<|startoftext|>"],
            eos_token_id=vocab["<|endoftext|>"],
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=32, patch_size=16,
        ),
        projection_dim=16,
    )
    CLIPModel(cfg).save_pretrained(d)
    return str(d)


def test_encode_text_queries_shape_and_norm(tiny_clip_dir):
    queries = ["sand", "rubber duck", "wooden table leg"]
    emb = encode_text_queries(queries, model_name=tiny_clip_dir)
    assert emb.shape == (3, 16)
    assert emb.dtype == np.float32
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), np.ones(3), rtol=1e-5
    )


def test_encode_text_queries_deterministic_and_distinct(tiny_clip_dir):
    q = ["snow", "metal"]
    a = encode_text_queries(q, model_name=tiny_clip_dir)
    b = encode_text_queries(q, model_name=tiny_clip_dir)
    np.testing.assert_array_equal(a, b)
    # different queries map to different embeddings (random-init weights
    # give small but nonzero separation)
    assert not np.array_equal(a[0], a[1])
