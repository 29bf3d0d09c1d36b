"""3D U-Net material predictors in flax.linen.

Reimplements the reference's active network path
(third_party/Wavelet-Generation/models/module/diffusion_network.py):

  * ``MyResBlock`` (diffusion_network.py:639-710): LayerNorm over the three
    SPATIAL dims with affine params of shape (sp,sp,sp) — an unusual choice we
    reproduce bit-for-bit — then activation then 3x3x3 conv; the second conv
    is zero-initialized (nn.py:68-74 ``zero_module``).
  * ``MyUNetModel`` (diffusion_network.py:712-935): conv-in, per-level
    res-blocks, stride-2 conv ``Downsample`` (diffusion_network.py:75-97),
    nearest-neighbor ``Upsample`` + conv (diffusion_network.py:50-71),
    middle Res-Attn-Res (attention is ALWAYS present in the middle block),
    skip-concat decoder ([h, skip] channel order, diffusion_network.py:921),
    LayerNorm head with zero-init conv.
  * ``AttentionBlock``/``QKVAttention`` (diffusion_network.py:192-262):
    GroupNorm(32), 1x1 qkv conv, softmax(QK/sqrt(sqrt(d))) in fp32.
  * ``FeatureProjector`` (diffusion_network.py:534-589): 1x1 conv + GN(32) +
    SiLU [+ 3x3 conv + GN + SiLU + 1x1 conv + GN] for the deep variant used
    with 768-d CLIP features (hidden=128 when feature_channels > cond_dim,
    training_discrete.py:64).
  * ``SegmentationUNet`` (training_discrete.py:50-88) and ``RegressionUNet``
    (training_continuous_mse.py:48-89) heads with LeakyReLU(0.02).

Layout is channel-last (N, D, H, W, C) — TPU-native; the torch checkpoint
converter (convert_torch.py) handles the transposition.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu_002(x):
    return jax.nn.leaky_relu(x, negative_slope=0.02)


class SpatialLayerNorm(nn.Module):
    """torch.nn.LayerNorm(normalized_shape=[sp,sp,sp]) on NCDHW tensors.

    Normalizes over the spatial dims per (batch, channel) with learnable
    affine parameters of shape (sp, sp, sp) shared across channels.
    Input here is channel-last (N,D,H,W,C): reduce over axes (1,2,3).
    """

    sp: int
    eps: float = 1e-5
    dtype: object = None
    # n_pack > 1: the channel axis carries n_pack independent networks
    # (lane-packed, see models/joint.py); affine params are per-pack
    # (n_pack, sp, sp, sp), applied to each pack's channel slice.
    # Normalization is per-(batch, channel) over space, so it is already
    # pack-independent — only the affine needs the pack structure.
    # pack_segments: optional ((n_channels, pack_id), ...) static spec for
    # non-contiguous pack layouts (the decoder's [h0,h1,s0,s1] concat);
    # None means n_pack contiguous equal slices.
    n_pack: int = 1
    pack_segments: tuple = None

    @nn.compact
    def __call__(self, x):
        shape = (self.sp, self.sp, self.sp)
        if self.n_pack > 1:
            shape = (self.n_pack,) + shape
        weight = self.param("weight", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        if self.n_pack > 1:
            # fold the per-pack affines into (sp,sp,sp,C)-broadcast factors
            # via channel masks; everything fuses into the normalize pass
            # (the masks and (sp,sp,sp) params are broadcast reads).
            c = x.shape[-1]
            if self.pack_segments is not None:
                import numpy as _np

                lane = jnp.asarray(_np.concatenate(
                    [_np.full(nc, pid, _np.int32)
                     for nc, pid in self.pack_segments]
                ))
                assert lane.shape[0] == c, (lane.shape, c)
            else:
                lane = jnp.arange(c) // (c // self.n_pack)
            w_full = jnp.zeros((self.sp, self.sp, self.sp, c), weight.dtype)
            b_full = jnp.zeros_like(w_full)
            for p in range(self.n_pack):
                m = (lane == p).astype(weight.dtype)
                w_full = w_full + weight[p][..., None] * m
                b_full = b_full + bias[p][..., None] * m
            weight, bias = w_full, b_full
        else:
            weight = weight[..., None]
            bias = bias[..., None]
        if self.dtype is None:
            mean = x.mean(axis=(1, 2, 3), keepdims=True)
            var = x.var(axis=(1, 2, 3), keepdims=True)
            xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
            return xn * weight[None] + bias[None]
        # low-precision compute path: statistics in fp32 (converts fuse into
        # the reductions; the (B,1,1,1,C) results are tiny), normalize+affine
        # in the compute dtype — the fp32-param path above would otherwise
        # promote the whole activation to fp32 and back around every LN
        # (profiled: ~3 ms of multiply_convert + copies per 64^3 net pass)
        n_sp = x.shape[1] * x.shape[2] * x.shape[3]
        if LN_STATS_VIA_DOT:
            # MXU-dot statistics: the spatial reductions lower to slow
            # cross-sublane convert_reduce fusions (~0.5 ms each, ~17 ms/pair
            # profiled); instead contract the spatial dims on the MXU.
            # sum      = ones(D,H,W) . x                    -> (B, C)
            # sum-of-squares = diag(x . x over spatial)     -> (B, C, C) diag
            # bf16 x bf16 products are exact in fp32 accumulation (8-bit
            # mantissas -> 16-bit products), so this is MORE accurate than
            # the converted-elementwise square it replaces.
            ones_sp = jnp.ones(x.shape[1:4], x.dtype)
            s1 = jax.lax.dot_general(
                x, ones_sp, (((1, 2, 3), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, C)
            gram = jax.lax.dot_general(
                x, x, (((1, 2, 3), (1, 2, 3)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (B, C, C)
            s2 = jnp.diagonal(gram, axis1=1, axis2=2)  # (B, C)
            s1 = s1[:, None, None, None, :]
            s2 = s2[:, None, None, None, :]
        else:
            # one-pass stats: a single VARIADIC reduce yields sum and
            # sum-of-squares from one traversal (two separate reduce ops
            # don't share their reads on TPU — measured 1.006 -> 0.650
            # ms/op at (1,64^3,128) bf16)
            xf = x.astype(jnp.float32)
            s1, s2 = jax.lax.reduce(
                (xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
                lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2, 3),
            )
            s1 = s1[:, None, None, None, :]
            s2 = s2[:, None, None, None, :]
        mean = s1 / n_sp
        var = jnp.maximum(s2 / n_sp - mean * mean, 0.0)
        scale = jax.lax.rsqrt(var + self.eps)
        xn = (x - mean.astype(self.dtype)) * scale.astype(self.dtype)
        return (xn * weight[None].astype(self.dtype)
                + bias[None].astype(self.dtype))


# Lower stride-1 3x3x3 convs as three depth-shifted 2D convs summed.  XLA's
# native 3D-conv path on TPU materializes 5-D windowed buffers and layout
# transposes around every conv (profiled: ~190 copies / 7 ms per 64^3 net
# pass); the 2D decomposition rides the tuned 2D conv path with identical
# math and an identical param tree.  Trace-time switch.
CONV3_VIA_2D = True

# Shift the conv OUTPUTS instead of the inputs: slicing the input feeds a
# conv, so XLA must materialize each depth-shifted copy (profiled: ~9 ms of
# slice copies per pair); running the three taps on the unshifted input and
# summing depth-shifted outputs turns the shifts into one fusible
# concat-add.  Identical math.  Trace-time switch.
CONV3_SHIFT_OUTPUTS = True

# Compute SpatialLayerNorm statistics as MXU contractions instead of
# VPU reductions (see SpatialLayerNorm).  MEASURED SLOWER on v5e (120.8 vs
# 114.1 ms/pair): the (C,S)x(S,C) Gram needs an operand transpose that costs
# more than the reduce it replaces.  Kept for reference; default off.
LN_STATS_VIA_DOT = False


class _Conv3DVia2D(nn.Module):
    """3x3x3 SAME conv == sum_t conv2d(depth-tap_t(x), k[t]), stride 1 or 2.

    Param tree matches ``nn.Conv`` ({kernel (3,3,3,Cin,F), bias (F,)}), so
    torch checkpoints and the fp32 reference path load unchanged.
    """

    features: int
    strides: int = 1
    zero_init: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (3, 3, 3, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x, kernel, bias = (t.astype(self.dtype) for t in (x, kernel, bias))
        s = self.strides
        d_out = (d + s - 1) // s
        dn = jax.lax.conv_dimension_numbers(
            (n * d_out, h, w, c), (3, 3, c, self.features), ("NHWC", "HWIO", "NHWC")
        )
        if s == 1 and CONV3_SHIFT_OUTPUTS:
            # out(d) = sum_t conv2d(x(d+t-1), k[t]) = sum_t y_t(d+t-1) where
            # y_t = conv2d of ALL depth slices with tap t's 2D kernel; the
            # depth shifts land on the outputs, where they fuse into one add.
            flat = x.reshape(n * d, h, w, c)
            ys = [
                jax.lax.conv_general_dilated(
                    flat, kernel[t], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn,
                ).reshape(n, d, h, w, self.features)
                for t in range(3)
            ]
            zs = jnp.zeros((n, 1, h, w, self.features), ys[0].dtype)
            out = (jnp.concatenate([zs, ys[0][:, :-1]], axis=1) + ys[1]
                   + jnp.concatenate([ys[2][:, 1:], zs], axis=1))
            return out + bias
        zslice = jnp.zeros((n, 1, h, w, c), x.dtype)
        out = None
        for t in range(3):
            if s == 1:
                if t == 0:    # output depth di reads input depth di-1
                    xs = jnp.concatenate([zslice, x[:, :-1]], axis=1)
                elif t == 1:
                    xs = x
                else:         # reads input depth di+1
                    xs = jnp.concatenate([x[:, 1:], zslice], axis=1)
            else:
                # output depth di reads input depth s*di + t - 1: zero-pad
                # one slice each side, take every s-th starting at t
                xp = jnp.concatenate([zslice, x, zslice], axis=1)
                xs = xp[:, t::s][:, :d_out]
            o = jax.lax.conv_general_dilated(
                xs.reshape(n * d_out, h, w, c), kernel[t], (s, s),
                [(1, 1), (1, 1)], dimension_numbers=dn,
            )
            out = o if out is None else out + o
        hw = out.shape[1:3]
        return out.reshape(n, d_out, *hw, self.features) + bias


def conv3(features, kernel=3, strides=1, zero_init=False, name=None, dtype=None):
    # stride-2 decomposition measured SLOWER on v5e (120 vs 112 ms/pair:
    # the strided depth-slice gather outweighs the native-conv savings) —
    # only stride-1 convs take the 2D path
    if CONV3_VIA_2D and kernel == 3 and strides == 1:
        return _Conv3DVia2D(features, strides=strides, zero_init=zero_init,
                            dtype=dtype, name=name)
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel, kernel),
        strides=(strides, strides, strides),
        padding=[(kernel // 2,) * 2] * 3,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class _SplitInputConv(nn.Module):
    """conv(concat([a, b], -1)) without materializing the concat.

    Channel-concat along the (padded) lane axis forces full-activation layout
    copies on TPU; a conv is linear in its input channels, so
    ``conv(cat(a,b)) == conv_a(a) + conv_b(b)`` with the kernel split along
    the input-channel dim.  The param tree is IDENTICAL to ``nn.Conv`` with
    the full (k,k,k, Ca+Cb, F) kernel — torch checkpoints load unchanged.
    """

    features: int
    kernel: int = 3
    zero_init: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, a, b):
        in_ch = a.shape[-1] + b.shape[-1]
        k = self.kernel
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (k, k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            a, b, kernel, bias = (t.astype(self.dtype) for t in (a, b, kernel, bias))
        dn = jax.lax.conv_dimension_numbers(
            a.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        pad = [(k // 2, k // 2)] * 3
        ca = a.shape[-1]
        out = jax.lax.conv_general_dilated(
            a, kernel[..., :ca, :], (1, 1, 1), pad, dimension_numbers=dn
        ) + jax.lax.conv_general_dilated(
            b, kernel[..., ca:, :], (1, 1, 1), pad, dimension_numbers=dn
        )
        return out + bias


class MyResBlock(nn.Module):
    """LayerNorm-act-conv x2 residual block (diffusion_network.py:639-710).

    When ``skip_in`` is given, the block behaves exactly as if called on
    ``concat([x, skip_in], -1)``: the spatial LayerNorm's statistics are
    per-(batch, channel) and its affine is shared across channels, so it
    commutes with channel concat, and the two input convs split their
    kernels (see _SplitInputConv) — no concat is ever materialized.
    """

    out_channels: int
    sp: int
    dropout: float = 0.0
    use_conv_skip: bool = False
    dtype: object = None
    n_pack: int = 1
    # pack layout of the INPUT channels when it isn't contiguous slices
    # (decoder concat blocks); see SpatialLayerNorm.pack_segments
    in_pack_segments: tuple = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, skip_in=None):
        in_ch = x.shape[-1] + (0 if skip_in is None else skip_in.shape[-1])
        if self.in_pack_segments is not None:
            # identity-skip would add mismatched pack layouts
            assert in_ch != self.out_channels, (
                "non-contiguous pack input requires a projecting skip")
        in_norm = SpatialLayerNorm(self.sp, dtype=self.dtype, name="in_norm",
                                   n_pack=self.n_pack,
                                   pack_segments=self.in_pack_segments)
        if skip_in is None:
            h = leaky_relu_002(in_norm(x))
            h = conv3(self.out_channels, name="in_conv", dtype=self.dtype)(h)
        else:
            ha = leaky_relu_002(in_norm(x))
            hb = leaky_relu_002(in_norm(skip_in))
            h = _SplitInputConv(self.out_channels, kernel=3, name="in_conv",
                                dtype=self.dtype)(ha, hb)
        h = SpatialLayerNorm(self.sp, dtype=self.dtype, name="out_norm",
                             n_pack=self.n_pack)(h)
        h = leaky_relu_002(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3(self.out_channels, zero_init=True, name="out_conv",
                  dtype=self.dtype)(h)

        if in_ch == self.out_channels:
            skip = x if skip_in is None else jnp.concatenate([x, skip_in], axis=-1)
        elif self.use_conv_skip:
            if skip_in is None:
                skip = conv3(self.out_channels, name="skip_conv", dtype=self.dtype)(x)
            else:
                skip = _SplitInputConv(self.out_channels, kernel=3,
                                       name="skip_conv", dtype=self.dtype)(x, skip_in)
        else:
            if skip_in is None:
                skip = conv3(self.out_channels, kernel=1, name="skip_conv",
                             dtype=self.dtype)(x)
            else:
                skip = _SplitInputConv(self.out_channels, kernel=1,
                                       name="skip_conv", dtype=self.dtype)(x, skip_in)
        return skip + h


class AttentionBlock(nn.Module):
    """Self-attention over flattened voxels (diffusion_network.py:192-262).

    ``dtype`` keeps the always-on middle-block attention in the compute dtype
    (fp32 params would otherwise re-promote the bf16 activations through
    GroupNorm/Dense); the QK softmax stays fp32 as in the reference.
    """

    num_heads: int = 1
    dtype: object = None
    # n_pack > 1: channel axis carries n_pack packed nets.  Each pack becomes
    # an independent attention head group (heads = n_pack * num_heads) and the
    # GroupNorm uses each pack's own group count so groups never cross packs
    # (requires min(32, c_pack) to divide c_pack, true for the reference's
    # channel sizes).  The packed qkv kernel keeps each pack's [q k v] block
    # contiguous, so the head reshape below is exactly per-net attention.
    n_pack: int = 1

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        t = d * h * w
        flat = x.reshape(n, t, c)

        groups = min(32, c // self.n_pack) * self.n_pack
        heads = self.num_heads * self.n_pack
        xn = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="norm",
                          dtype=self.dtype)(flat)
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(xn)  # 1x1 conv == dense over channels
        if heads > 1:
            # channel-last head split: qkv channels are [head0: q k v,
            # head1: q k v, ...]; a flat reshape (valid in the reference's
            # channel-first layout) would mix spatial and channel dims here.
            # Layout parity note: the torch reference's legacy QKVAttention
            # (diffusion_network.py:217 `qkv.reshape(b*num_heads, -1, t)`)
            # ALSO reinterprets the conv's [q(c) k(c) v(c)] output columns
            # head-major, so torch-converted checkpoints keep identical
            # semantics at any num_heads — not just the tested num_heads=1.
            qkv = qkv.reshape(n, t, heads, 3 * (c // heads))
            qkv = qkv.transpose(0, 2, 1, 3).reshape(n * heads, t, 3 * (c // heads))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ch = c // heads
        scale = 1.0 / jnp.sqrt(jnp.sqrt(ch)).astype(x.dtype)
        if q.dtype == jnp.float32:
            weight = jnp.einsum(
                "btc,bsc->bts", q * scale, k * scale, precision="highest"
            )
            weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1
                                    ).astype(weight.dtype)
            a = jnp.einsum("bts,bsc->btc", weight, v, precision="highest")
        else:
            # low-precision path: bf16 MXU inputs with fp32 accumulation
            # (precision="highest" on bf16 operands trips a Mosaic matmul
            # lowering bug on this toolchain at batch>1, and 6-pass bf16 is
            # overkill for the 8^3 middle attention anyway)
            weight = jnp.einsum("btc,bsc->bts", q * scale, k * scale,
                                preferred_element_type=jnp.float32)
            weight = jax.nn.softmax(weight, axis=-1).astype(q.dtype)
            a = jnp.einsum("bts,bsc->btc", weight, v,
                           preferred_element_type=jnp.float32).astype(q.dtype)
        if heads > 1:
            a = a.reshape(n, heads, t, ch).transpose(0, 2, 1, 3)
        a = a.reshape(n, t, c)
        a = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj_out",
                     dtype=self.dtype)(a)
        return (flat + a).reshape(n, d, h, w, c)


class Downsample(nn.Module):
    """Stride-2 conv (diffusion_network.py:75-97, use_conv path)."""

    channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return conv3(self.channels, strides=2, name="op", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest x2 + conv (diffusion_network.py:50-71)."""

    channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        x = jax.image.resize(x, (n, d * 2, h * 2, w * 2, c), method="nearest")
        return conv3(self.channels, name="conv", dtype=self.dtype)(x)


class FeatureProjector(nn.Module):
    """CLIP-feature projector (diffusion_network.py:534-589)."""

    out_channels: int
    hidden_channels: int | None = None
    dtype: object = None
    # n_pack > 1: out/hidden channels carry n_pack packed nets; GroupNorm
    # group counts are per-pack so groups never cross packs.  The input x is
    # SHARED (not packed) — each pack's conv0 block reads all of it.
    n_pack: int = 1

    @nn.compact
    def __call__(self, x):
        if self.hidden_channels is None:
            x = conv3(self.out_channels, kernel=1, name="conv0", dtype=self.dtype)(x)
            x = nn.GroupNorm(
                num_groups=max(self.out_channels // (2 * self.n_pack), 1) * self.n_pack,
                epsilon=1e-5, name="gn0",
            )(x)
            return jax.nn.silu(x)
        gh = min(32, self.hidden_channels // self.n_pack) * self.n_pack
        go = min(32, self.out_channels // self.n_pack) * self.n_pack
        x = conv3(self.hidden_channels, kernel=1, name="conv0", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=gh, epsilon=1e-5, name="gn0", dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        x = conv3(self.hidden_channels, kernel=3, name="conv1", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=gh, epsilon=1e-5, name="gn1", dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        x = conv3(self.out_channels, kernel=1, name="conv2", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=go, epsilon=1e-5, name="gn2", dtype=self.dtype)(x)
        return x


class MyUNetModel(nn.Module):
    """The reference U-Net (diffusion_network.py:712-935), channel-last."""

    model_channels: int = 64
    out_channels: int = 8
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 1, 2, 4)
    attention_resolutions: Sequence[int] = ()
    spatial_size: int = 64
    dropout: float = 0.0
    num_heads: int = 1
    dtype: object = None
    # decompose decoder skip-concats into split-kernel convs (identical math
    # and param tree; measured a wash on v5e at 64^3 — kept as an option, the
    # literal concat is the default)
    fuse_skip_concat: bool = False
    # n_pack > 1: run n_pack lane-packed independent nets (models/joint.py);
    # all channel counts (model_channels, out_channels, input) are JOINT
    # totals = n_pack * per-net counts.
    n_pack: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hs = []
        ch = self.model_channels
        h = conv3(ch, name="conv_in", dtype=self.dtype)(x)
        hs.append(h)

        ds = 1
        sp = self.spatial_size
        sizes = [sp]
        block = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = MyResBlock(ch, sp, self.dropout, dtype=self.dtype,
                               n_pack=self.n_pack,
                               name=f"down_{block}")(h, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, dtype=self.dtype,
                                       n_pack=self.n_pack,
                                       name=f"down_attn_{block}")(h)
                hs.append(h)
                block += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"downsample_{level}")(h)
                hs.append(h)
                sizes.append(sp)
                ds *= 2
                sp = (sp + 1) // 2

        h = MyResBlock(ch, sp, self.dropout, dtype=self.dtype,
                       n_pack=self.n_pack, name="middle_0")(h, deterministic)
        h = AttentionBlock(self.num_heads, dtype=self.dtype,
                           n_pack=self.n_pack, name="middle_attn")(h)
        h = MyResBlock(ch, sp, self.dropout, dtype=self.dtype,
                       n_pack=self.n_pack, name="middle_2")(h, deterministic)

        block = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                # crop for non-even inputs (diffusion_network.py:913-919)
                if skip.shape[1] < h.shape[1]:
                    h = h[:, :-1]
                if skip.shape[2] < h.shape[2]:
                    h = h[:, :, :-1]
                if skip.shape[3] < h.shape[3]:
                    h = h[:, :, :, :-1]
                ch = self.model_channels * mult
                segs = None
                if self.n_pack > 1:
                    hp = h.shape[-1] // self.n_pack
                    sp_ch = skip.shape[-1] // self.n_pack
                    segs = tuple((hp, p) for p in range(self.n_pack)) + tuple(
                        (sp_ch, p) for p in range(self.n_pack))
                if self.fuse_skip_concat:
                    # x and skip are normalized separately here and each is
                    # pack-contiguous on its own — no segment map needed
                    h = MyResBlock(ch, sp, self.dropout, dtype=self.dtype,
                                   n_pack=self.n_pack,
                                   name=f"up_{block}")(h, deterministic,
                                                       skip_in=skip)
                else:
                    cat = jnp.concatenate([h, skip], axis=-1)
                    h = MyResBlock(ch, sp, self.dropout, dtype=self.dtype,
                                   n_pack=self.n_pack, in_pack_segments=segs,
                                   name=f"up_{block}")(cat, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, dtype=self.dtype,
                                       n_pack=self.n_pack,
                                       name=f"up_attn_{block}")(h)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, dtype=self.dtype, name=f"upsample_{block}")(h)
                    ds //= 2
                    sp = sizes.pop()
                block += 1

        h = SpatialLayerNorm(sp, dtype=self.dtype, name="out_norm",
                             n_pack=self.n_pack)(h)
        h = leaky_relu_002(h)
        return conv3(self.out_channels, zero_init=True, name="out_conv",
                     dtype=self.dtype)(h)


class SegmentationUNet(nn.Module):
    """Discrete material classifier head (training_discrete.py:50-88)."""

    feature_channels: int = 768
    cond_dim: int = 32
    model_channels: int = 64
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 1, 2, 4)
    attention_resolutions: Sequence[int] = ()
    grid_size: int = 64
    num_classes: int = 8
    dtype: object = None
    fuse_skip_concat: bool = False

    @nn.compact
    def __call__(self, feat_grid, deterministic: bool = True):
        x = feat_grid
        if self.feature_channels != self.cond_dim:
            hidden = 128 if self.feature_channels > self.cond_dim else None
            x = FeatureProjector(self.cond_dim, hidden, dtype=self.dtype,
                                 name="projector")(x)
        return MyUNetModel(
            model_channels=self.model_channels,
            out_channels=self.num_classes,
            num_res_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            attention_resolutions=tuple(self.attention_resolutions),
            spatial_size=self.grid_size,
            dtype=self.dtype,
            fuse_skip_concat=self.fuse_skip_concat,
            name="unet",
        )(x, deterministic)


class RegressionUNet(nn.Module):
    """Continuous (density, E, nu) regressor head (training_continuous_mse.py:48-89)."""

    feature_channels: int = 768
    cond_dim: int = 32
    model_channels: int = 64
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 1, 2, 4)
    attention_resolutions: Sequence[int] = ()
    grid_size: int = 64
    out_channels: int = 3
    dtype: object = None
    fuse_skip_concat: bool = False

    @nn.compact
    def __call__(self, feat_grid, deterministic: bool = True):
        x = feat_grid
        if self.feature_channels != self.cond_dim:
            hidden = 128 if self.feature_channels > self.cond_dim else None
            x = FeatureProjector(self.cond_dim, hidden, dtype=self.dtype,
                                 name="projector")(x)
        return MyUNetModel(
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            attention_resolutions=tuple(self.attention_resolutions),
            spatial_size=self.grid_size,
            dtype=self.dtype,
            fuse_skip_concat=self.fuse_skip_concat,
            name="unet",
        )(x, deterministic)
