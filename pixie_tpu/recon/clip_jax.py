"""JAX/flax CLIP vision tower for dense patch-feature extraction on TPU.

The torch path (recon/clip_features.py) wraps HF transformers on CPU; this
is the TPU-native tower: channel-last patchify as one MXU matmul, pre-LN
transformer blocks in bf16-able dtype, bilinear position-embedding
interpolation for non-square inputs (f3rm extracts at shortest-edge-336
WITHOUT center crop — reference f3rm/features/clip_extract.py:11-89 — so
rectangular patch grids are the common case).

``convert_clip_vision_state_dict`` maps HF CLIPVisionModel weights onto the
module 1:1; tests/test_clip_jax.py asserts element-wise parity against the
torch implementation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    patch_size: int = 14
    image_size: int = 336
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l_14_336(cls):
        return cls()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: object = None

    @nn.compact
    def __call__(self, h):
        c = self.cfg
        eps = c.layer_norm_eps
        res = h
        h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="ln1")(h)
        qkv = nn.DenseGeneral((3, c.hidden_size), axis=-1, dtype=self.dtype,
                              name="qkv")(h)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        b, t, _ = q.shape
        hd = c.hidden_size // c.num_attention_heads

        def split(x):
            return x.reshape(b, t, c.num_attention_heads, hd)

        # fp32 softmax as in the torch reference
        logits = jnp.einsum("bqhc,bkhc->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits * (1.0 / np.sqrt(hd)), axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn.astype(v.dtype), split(v))
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="proj")(
            out.reshape(b, t, c.hidden_size))
        h = res + h

        res = h
        h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="ln2")(h)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return res + h


class CLIPVisionTower(nn.Module):
    """pixel_values (B, H, W, 3) channel-last, CLIP-normalized ->
    last_hidden_state (B, 1 + Hp*Wp, hidden) — CLS first, as HF."""

    cfg: CLIPVisionConfig
    dtype: object = None

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        b, h, w, _ = pixel_values.shape
        p = c.patch_size
        assert h % p == 0 and w % p == 0, "input must be patch-aligned"
        hp, wp = h // p, w // p

        # patchify as one matmul: (B, Hp, Wp, p*p*3) @ (p*p*3, hidden)
        x = pixel_values.reshape(b, hp, p, wp, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp * wp, p * p * 3)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        patch_kernel = self.param(
            "patch_kernel", nn.initializers.lecun_normal(),
            (p * p * 3, c.hidden_size), jnp.float32)
        x = x @ patch_kernel.astype(x.dtype)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1 + (c.image_size // p) ** 2, c.hidden_size), jnp.float32)
        pos_cls, pos_grid = pos[:1], pos[1:]
        side = c.image_size // p
        if (hp, wp) != (side, side):
            # bicubic interpolation of the grid part, matching HF
            # interpolate_pos_encoding (modeling_clip.py uses
            # F.interpolate(mode="bicubic")); jax.image "cubic" is Keys
            # bicubic without torch's antialias prefilter — residual
            # difference is bounded by tests/test_clip_jax.py.
            grid = pos_grid.reshape(side, side, c.hidden_size)
            pos_grid = jax.image.resize(
                grid, (hp, wp, c.hidden_size), method="cubic"
            ).reshape(hp * wp, c.hidden_size)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.hidden_size)), x],
            axis=1,
        )
        x = x + jnp.concatenate([pos_cls, pos_grid], axis=0).astype(x.dtype)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="pre_ln")(x)
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(x)
        return x


def convert_clip_vision_state_dict(state_dict, cfg: CLIPVisionConfig) -> dict:
    """HF CLIPVisionModel state_dict (torch tensors or numpy) -> flax params
    for CLIPVisionTower.  Key layout: vision_model.embeddings.*,
    vision_model.encoder.layers.{i}.*, vision_model.pre_layrnorm.*."""

    def get(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    pref = "vision_model."
    if not any(k.startswith(pref) for k in state_dict):
        pref = ""
    # conv kernel (hidden, 3, p, p) -> (p*p*3, hidden) matching the
    # channel-last patchify (p_row, p_col, rgb) flattening
    conv = get(pref + "embeddings.patch_embedding.weight")
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])

    params = {
        "patch_kernel": patch_kernel,
        "class_embedding": get(pref + "embeddings.class_embedding"),
        "position_embedding": get(pref + "embeddings.position_embedding.weight"),
        "pre_ln": {"scale": get(pref + "pre_layrnorm.weight"),
                   "bias": get(pref + "pre_layrnorm.bias")},
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{pref}encoder.layers.{i}."
        qw = get(lp + "self_attn.q_proj.weight")
        kw = get(lp + "self_attn.k_proj.weight")
        vw = get(lp + "self_attn.v_proj.weight")
        qb = get(lp + "self_attn.q_proj.bias")
        kb = get(lp + "self_attn.k_proj.bias")
        vb = get(lp + "self_attn.v_proj.bias")
        # attention scaling folded into q as HF does (q * scale) — instead
        # keep parity by scaling inside the module; here plain stack:
        params[f"layer_{i}"] = {
            "ln1": {"scale": get(lp + "layer_norm1.weight"),
                    "bias": get(lp + "layer_norm1.bias")},
            "qkv": {
                "kernel": np.stack([qw.T, kw.T, vw.T], axis=1),  # (in, 3, out)
                "bias": np.stack([qb, kb, vb], axis=0),          # (3, out)
            },
            "proj": {"kernel": get(lp + "self_attn.out_proj.weight").T,
                     "bias": get(lp + "self_attn.out_proj.bias")},
            "ln2": {"scale": get(lp + "layer_norm2.weight"),
                    "bias": get(lp + "layer_norm2.bias")},
            "fc1": {"kernel": get(lp + "mlp.fc1.weight").T,
                    "bias": get(lp + "mlp.fc1.bias")},
            "fc2": {"kernel": get(lp + "mlp.fc2.weight").T,
                    "bias": get(lp + "mlp.fc2.bias")},
        }
    return params


# CLIP image normalization (HF CLIPImageProcessor defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def extract_clip_features_jax(
    images: np.ndarray,
    params,
    cfg: CLIPVisionConfig | None = None,
    dtype=jnp.bfloat16,
    batch_size: int = 4,
) -> np.ndarray:
    """images (N, H, W, 3) float [0,1], patch-aligned -> dense patch
    features (N, Hp, Wp, hidden) — last_hidden_state minus CLS, the layout
    f3rm distills (clip_extract.py:60-89)."""
    cfg = cfg or CLIPVisionConfig.vit_l_14_336()
    tower = CLIPVisionTower(cfg, dtype=dtype)

    @jax.jit
    def fwd(px):
        return tower.apply({"params": params}, px)[:, 1:]

    n, h, w, _ = images.shape
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    norm = (images - CLIP_MEAN) / CLIP_STD
    outs = []
    for i in range(0, n, batch_size):
        out = fwd(jnp.asarray(norm[i : i + batch_size], jnp.float32))
        outs.append(np.asarray(out, np.float32))
    return np.concatenate(outs).reshape(n, hp, wp, cfg.hidden_size)
