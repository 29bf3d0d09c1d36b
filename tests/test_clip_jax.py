"""Element-wise parity of the JAX CLIP vision tower against the HF torch
implementation (random weights — architecture + converter validation, the
same methodology as tests/test_unet_parity.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pixie_tpu.recon.clip_jax import (CLIP_MEAN, CLIP_STD, CLIPVisionConfig,
                                      CLIPVisionTower,
                                      convert_clip_vision_state_dict,
                                      extract_clip_features_jax)

TINY = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        patch_size=8, image_size=32)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel

    hf_cfg = HFConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        patch_size=TINY.patch_size, image_size=TINY.image_size,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    return CLIPVisionModel(hf_cfg).eval()


def _jax_params(torch_model):
    return convert_clip_vision_state_dict(torch_model.state_dict(), TINY)


def test_square_input_parity(torch_model):
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    tower = CLIPVisionTower(TINY)
    got = np.asarray(tower.apply({"params": _jax_params(torch_model)}, px))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_rectangular_input_interpolated_pos(torch_model):
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 24, 40, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            interpolate_pos_encoding=True,
        ).last_hidden_state.numpy()

    tower = CLIPVisionTower(TINY)
    got = np.asarray(tower.apply({"params": _jax_params(torch_model)}, px))
    # pos-embedding interpolation differs slightly (jax.image bilinear vs
    # torch F.interpolate antialias=True); bound the drift
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 0.15, f"interpolated parity drift too large: {err}"


def test_extract_dense_features(torch_model):
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    feats = extract_clip_features_jax(
        imgs, _jax_params(torch_model), TINY, dtype=None, batch_size=2)
    assert feats.shape == (3, 4, 4, TINY.hidden_size)

    with torch.no_grad():
        norm = (imgs - CLIP_MEAN) / CLIP_STD
        ref = torch_model(
            pixel_values=torch.from_numpy(norm.transpose(0, 3, 1, 2))
        ).last_hidden_state[:, 1:].numpy().reshape(3, 4, 4, -1)
    np.testing.assert_allclose(feats, ref, atol=2e-5, rtol=2e-5)
