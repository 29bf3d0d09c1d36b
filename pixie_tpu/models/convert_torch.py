"""PyTorch ``epoch_*.pth`` checkpoint -> flax params converter.

The reference trains SegmentationUNet / RegressionUNet with torch DDP and
saves ``{"model_state_dict": ...}`` checkpoints (training_discrete.py:257-264).
This module maps those state_dicts onto the flax modules in unet3d.py so the
released HF checkpoints run on TPU unchanged.

Key layout conversions:
  * Conv3d weight (O, I, kD, kH, kW)  ->  flax kernel (kD, kH, kW, I, O)
  * Conv1d/1x1 attention weight (O, I, 1) -> Dense kernel (I, O)
  * LayerNorm([sp,sp,sp]) weight/bias -> SpatialLayerNorm weight/bias (same shape)
  * GroupNorm weight/bias -> flax GroupNorm scale/bias
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv_w(w) -> np.ndarray:
    """(O,I,kD,kH,kW) -> (kD,kH,kW,I,O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _dense_from_conv1d(w) -> np.ndarray:
    """(O,I,1) -> (I,O)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, :, 0].T)


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _strip_prefixes(sd: Mapping[str, object]) -> dict[str, np.ndarray]:
    """Drop DDP 'module.' prefixes and convert tensors to numpy."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


def _convert_resblock(sd, torch_prefix: str) -> dict:
    p = {
        "in_norm": {
            "weight": sd[f"{torch_prefix}.in_layers.0.weight"],
            "bias": sd[f"{torch_prefix}.in_layers.0.bias"],
        },
        "in_conv": {
            "kernel": _conv_w(sd[f"{torch_prefix}.in_layers.2.weight"]),
            "bias": sd[f"{torch_prefix}.in_layers.2.bias"],
        },
        "out_norm": {
            "weight": sd[f"{torch_prefix}.out_layers.0.weight"],
            "bias": sd[f"{torch_prefix}.out_layers.0.bias"],
        },
        "out_conv": {
            "kernel": _conv_w(sd[f"{torch_prefix}.out_layers.3.weight"]),
            "bias": sd[f"{torch_prefix}.out_layers.3.bias"],
        },
    }
    skip_w = f"{torch_prefix}.skip_connection.weight"
    if skip_w in sd:
        p["skip_conv"] = {
            "kernel": _conv_w(sd[skip_w]),
            "bias": sd[f"{torch_prefix}.skip_connection.bias"],
        }
    return p


def _convert_attention(sd, torch_prefix: str) -> dict:
    return {
        "norm": {
            "scale": sd[f"{torch_prefix}.norm.weight"],
            "bias": sd[f"{torch_prefix}.norm.bias"],
        },
        "qkv": {
            "kernel": _dense_from_conv1d(sd[f"{torch_prefix}.qkv.weight"]),
            "bias": sd[f"{torch_prefix}.qkv.bias"],
        },
        "proj_out": {
            "kernel": _dense_from_conv1d(sd[f"{torch_prefix}.proj_out.weight"]),
            "bias": sd[f"{torch_prefix}.proj_out.bias"],
        },
    }


def _convert_projector(sd) -> dict:
    """FeatureProjector.net Sequential (diffusion_network.py:545-589).

    Deep variant:  [conv, GN, SiLU, conv, GN, SiLU, conv, GN] -> idx 0,1,3,4,6,7
    Light variant: [conv, GN, SiLU]                            -> idx 0,1
    """
    deep = "projector.net.3.weight" in sd
    p = {
        "conv0": {
            "kernel": _conv_w(sd["projector.net.0.weight"]),
            "bias": sd["projector.net.0.bias"],
        },
        "gn0": {
            "scale": sd["projector.net.1.weight"],
            "bias": sd["projector.net.1.bias"],
        },
    }
    if deep:
        p["conv1"] = {
            "kernel": _conv_w(sd["projector.net.3.weight"]),
            "bias": sd["projector.net.3.bias"],
        }
        p["gn1"] = {
            "scale": sd["projector.net.4.weight"],
            "bias": sd["projector.net.4.bias"],
        }
        p["conv2"] = {
            "kernel": _conv_w(sd["projector.net.6.weight"]),
            "bias": sd["projector.net.6.bias"],
        }
        p["gn2"] = {
            "scale": sd["projector.net.7.weight"],
            "bias": sd["projector.net.7.bias"],
        }
    return p


def convert_state_dict(
    state_dict: Mapping[str, object],
    num_res_blocks: int = 3,
    channel_mult: tuple[int, ...] = (1, 1, 2, 4),
    attention_resolutions: tuple[int, ...] = (),
) -> dict:
    """torch state_dict (SegmentationUNet or RegressionUNet) -> flax params."""
    sd = _strip_prefixes(state_dict)
    params: dict = {}

    if any(k.startswith("projector.") for k in sd):
        params["projector"] = _convert_projector(sd)

    unet: dict = {}
    # conv-in: input_blocks.0 is Sequential(conv) (diffusion_network.py:779-785)
    unet["conv_in"] = {
        "kernel": _conv_w(sd["unet.input_blocks.0.0.weight"]),
        "bias": sd["unet.input_blocks.0.0.bias"],
    }

    # encoder: walk the same construction loop as MyUNetModel.__init__
    torch_idx = 1
    flax_block = 0
    ds = 1
    for level, _mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            prefix = f"unet.input_blocks.{torch_idx}.0"
            unet[f"down_{flax_block}"] = _convert_resblock(sd, prefix)
            if ds in attention_resolutions:
                unet[f"down_attn_{flax_block}"] = _convert_attention(
                    sd, f"unet.input_blocks.{torch_idx}.1"
                )
            torch_idx += 1
            flax_block += 1
        if level != len(channel_mult) - 1:
            unet[f"downsample_{level}"] = {
                "op": {
                    "kernel": _conv_w(sd[f"unet.input_blocks.{torch_idx}.0.op.weight"]),
                    "bias": sd[f"unet.input_blocks.{torch_idx}.0.op.bias"],
                }
            }
            torch_idx += 1
            ds *= 2

    unet["middle_0"] = _convert_resblock(sd, "unet.middle_block.0")
    unet["middle_attn"] = _convert_attention(sd, "unet.middle_block.1")
    unet["middle_2"] = _convert_resblock(sd, "unet.middle_block.2")

    # decoder
    flax_block = 0
    for level, _mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            prefix = f"unet.output_blocks.{flax_block}"
            unet[f"up_{flax_block}"] = _convert_resblock(sd, f"{prefix}.0")
            layer = 1
            if ds in attention_resolutions:
                unet[f"up_attn_{flax_block}"] = _convert_attention(sd, f"{prefix}.{layer}")
                layer += 1
            if level and i == num_res_blocks:
                unet[f"upsample_{flax_block}"] = {
                    "conv": {
                        "kernel": _conv_w(sd[f"{prefix}.{layer}.conv.weight"]),
                        "bias": sd[f"{prefix}.{layer}.conv.bias"],
                    }
                }
                ds //= 2
            flax_block += 1

    unet["out_norm"] = {
        "weight": sd["unet.out.0.weight"],
        "bias": sd["unet.out.0.bias"],
    }
    unet["out_conv"] = {
        "kernel": _conv_w(sd["unet.out.2.weight"]),
        "bias": sd["unet.out.2.bias"],
    }
    params["unet"] = unet
    return {"params": params}


def load_torch_checkpoint(path: str, **kwargs) -> dict:
    """Load an epoch_k.pth file and convert (requires torch, CPU-only ok)."""
    import torch  # noqa: PLC0415

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_state_dict(sd, **kwargs)
