"""Lane-packed joint material predictor: both U-Nets in one forward pass.

The reference runs two identical-architecture U-Nets per voxel grid — an
8-class segmentation net (training_discrete.py:50-88) and a 3-channel
regression net (training_continuous_mse.py:48-89) — on the SAME input
features (inference_combined.py:108-170).  On TPU, their C=64 channel axes
each fill only half of the 128 vector lanes, so every elementwise op, LayerNorm
and HBM transfer of the pair runs at 50% lane occupancy *on padding*.

This module packs the two nets into one C=128 network whose conv/dense
kernels are block-diagonal (seg in lanes [:64], cont in lanes [64:]):
mathematically EXACT — each net's channels never mix — while all
memory-bound work runs once at full lane width.  Measured on v5e:
113 ms/pair -> 90 ms joint at 64^3 (see docs/DESIGN.md).

``fuse_material_unets`` converts two separately-trained (or torch-converted)
param trees into the joint tree, so reference ``epoch_*.pth`` checkpoints
work unchanged: convert each with convert_torch.py, then fuse.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from flax import linen as nn

from pixie_tpu.models.unet3d import FeatureProjector, MyUNetModel


class JointMaterialUNet(nn.Module):
    """SegmentationUNet + RegressionUNet lane-packed into one module.

    All *_channels fields are PER-NET counts (matching the two heads'
    constructor args); the module internally doubles them.  Returns
    ``(seg_logits[..., num_classes], cont_pred[..., cont_channels])``.
    """

    feature_channels: int = 768
    cond_dim: int = 32
    model_channels: int = 64
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 1, 2, 4)
    attention_resolutions: Sequence[int] = ()
    grid_size: int = 64
    num_classes: int = 8
    cont_channels: int = 3
    projector_hidden: int = 128
    dtype: object = None
    fuse_skip_concat: bool = False

    @nn.compact
    def __call__(self, feat_grid, deterministic: bool = True):
        assert self.feature_channels > self.cond_dim, (
            "joint packing assumes the deep projector path (CLIP features)")
        x = FeatureProjector(
            2 * self.cond_dim, 2 * self.projector_hidden, dtype=self.dtype,
            n_pack=2, name="projector",
        )(feat_grid)
        out = MyUNetModel(
            model_channels=2 * self.model_channels,
            out_channels=self.num_classes + self.cont_channels,
            num_res_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            attention_resolutions=tuple(self.attention_resolutions),
            spatial_size=self.grid_size,
            dtype=self.dtype,
            fuse_skip_concat=self.fuse_skip_concat,
            n_pack=2,
            name="unet",
        )(x, deterministic)
        return out[..., : self.num_classes], out[..., self.num_classes:]


# --------------------------------------------------------------------------
# Parameter fusion
# --------------------------------------------------------------------------


def _np(a):
    return np.asarray(a)


def _concat(a, b, axis=-1):
    return np.concatenate([_np(a), _np(b)], axis=axis)


def _stack(a, b):
    return np.stack([_np(a), _np(b)], axis=0)


def _block_diag(k0, k1):
    """(..., ci0, co0) + (..., ci1, co1) -> (..., ci0+ci1, co0+co1)."""
    k0, k1 = _np(k0), _np(k1)
    ci0, co0 = k0.shape[-2:]
    ci1, co1 = k1.shape[-2:]
    out = np.zeros(k0.shape[:-2] + (ci0 + ci1, co0 + co1), k0.dtype)
    out[..., :ci0, :co0] = k0
    out[..., ci0:, co0:] = k1
    return out


def _block_diag_seg(k0, k1, ch_h: int, ch_s: int):
    """Decoder-concat variant: per-net input rows are [h(ch_h), s(ch_s)] but
    the joint concat layout is [h0, h1, s0, s1]."""
    k0, k1 = _np(k0), _np(k1)
    co0 = k0.shape[-1]
    co1 = k1.shape[-1]
    assert k0.shape[-2] == ch_h + ch_s, (k0.shape, ch_h, ch_s)
    out = np.zeros(k0.shape[:-2] + (2 * (ch_h + ch_s), co0 + co1), k0.dtype)
    out[..., 0:ch_h, :co0] = k0[..., :ch_h, :]
    out[..., ch_h:2 * ch_h, co0:] = k1[..., :ch_h, :]
    out[..., 2 * ch_h:2 * ch_h + ch_s, :co0] = k0[..., ch_h:, :]
    out[..., 2 * ch_h + ch_s:, co0:] = k1[..., ch_h:, :]
    return out


def _fuse_conv(c0, c1, segments=None):
    if segments is None:
        kernel = _block_diag(c0["kernel"], c1["kernel"])
    else:
        kernel = _block_diag_seg(c0["kernel"], c1["kernel"], *segments)
    return {"kernel": kernel, "bias": _concat(c0["bias"], c1["bias"])}


def _fuse_norm_affine(n0, n1):
    """GroupNorm / LayerNorm-style per-channel affine: concat."""
    return {k: _concat(n0[k], n1[k]) for k in n0}


def _fuse_spatial_ln(n0, n1):
    return {k: _stack(n0[k], n1[k]) for k in n0}


def _fuse_resblock(b0, b1, segments=None):
    out = {
        "in_norm": _fuse_spatial_ln(b0["in_norm"], b1["in_norm"]),
        "out_norm": _fuse_spatial_ln(b0["out_norm"], b1["out_norm"]),
        "in_conv": _fuse_conv(b0["in_conv"], b1["in_conv"], segments),
        "out_conv": _fuse_conv(b0["out_conv"], b1["out_conv"]),
    }
    if "skip_conv" in b0:
        out["skip_conv"] = _fuse_conv(b0["skip_conv"], b1["skip_conv"], segments)
    return out


def _fuse_attention(a0, a1):
    # qkv joint output columns: [seg q k v, cont q k v] — each pack's block
    # stays contiguous, matching the module's per-head channel split
    return {
        "norm": _fuse_norm_affine(a0["norm"], a1["norm"]),
        "qkv": _fuse_conv(a0["qkv"], a1["qkv"]),
        "proj_out": _fuse_conv(a0["proj_out"], a1["proj_out"]),
    }


def _decoder_input_channels(model_channels, channel_mult, num_res_blocks):
    """Per-net (ch_h, ch_skip) of each decoder block, mirroring
    MyUNetModel.__call__'s skip bookkeeping."""
    m = model_channels
    hs = [m]
    ch = m
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch = mult * m
            hs.append(ch)
        if level != len(channel_mult) - 1:
            hs.append(ch)
    res = {}
    block = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for _ in range(num_res_blocks + 1):
            skip = hs.pop()
            res[block] = (ch, skip)
            ch = m * mult
            block += 1
    return res


def fuse_material_unets(
    seg_params,
    cont_params,
    *,
    model_channels: int = 64,
    channel_mult: Sequence[int] = (1, 1, 2, 4),
    num_res_blocks: int = 3,
):
    """Fuse a SegmentationUNet and a RegressionUNet param tree (each
    {"projector": ..., "unet": ...}) into a JointMaterialUNet tree.

    Exact: joint(x) == (seg(x), cont(x)) up to float-op reassociation.
    """
    import jax

    seg_params = jax.tree.map(np.asarray, seg_params)
    cont_params = jax.tree.map(np.asarray, cont_params)
    dec = _decoder_input_channels(model_channels, tuple(channel_mult),
                                  num_res_blocks)

    p0, p1 = seg_params["projector"], cont_params["projector"]
    projector = {
        # conv0 reads the SHARED feature input: concat output columns only
        "conv0": {
            "kernel": _concat(p0["conv0"]["kernel"], p1["conv0"]["kernel"]),
            "bias": _concat(p0["conv0"]["bias"], p1["conv0"]["bias"]),
        },
        "conv1": _fuse_conv(p0["conv1"], p1["conv1"]),
        "conv2": _fuse_conv(p0["conv2"], p1["conv2"]),
    }
    for gn in ("gn0", "gn1", "gn2"):
        projector[gn] = _fuse_norm_affine(p0[gn], p1[gn])

    u0, u1 = seg_params["unet"], cont_params["unet"]
    unet = {}
    for name in u0:
        a, b = u0[name], u1[name]
        if name == "conv_in" or name == "out_conv":
            unet[name] = _fuse_conv(a, b)
        elif name == "out_norm":
            unet[name] = _fuse_spatial_ln(a, b)
        elif name.startswith("downsample_"):
            unet[name] = {"op": _fuse_conv(a["op"], b["op"])}
        elif name.startswith("upsample_"):
            unet[name] = {"conv": _fuse_conv(a["conv"], b["conv"])}
        elif "attn" in name:
            unet[name] = _fuse_attention(a, b)
        elif name.startswith("up_"):
            unet[name] = _fuse_resblock(a, b, segments=dec[int(name[3:])])
        else:  # down_*, middle_0, middle_2
            unet[name] = _fuse_resblock(a, b)
    return {"projector": projector, "unet": unet}
