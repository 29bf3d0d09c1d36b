"""JointMaterialUNet == (SegmentationUNet, RegressionUNet) exactly.

The lane-packed joint net (models/joint.py) must reproduce both per-net
outputs bit-for-bit up to float reassociation; this is the correctness
contract that lets the TPU inference path (and bench) run the fused C=128
network in place of the reference's two C=64 passes
(reference inference_combined.py:108-170).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixie_tpu.models.joint import JointMaterialUNet, fuse_material_unets
from pixie_tpu.models.unet3d import RegressionUNet, SegmentationUNet

ARCH = dict(model_channels=8, num_res_blocks=2, channel_mult=(1, 2),
            grid_size=8)
FEAT, COND = 24, 8


@pytest.fixture(scope="module")
def nets_and_params():
    seg = SegmentationUNet(feature_channels=FEAT, cond_dim=COND,
                           num_classes=5, **ARCH)
    cont = RegressionUNet(feature_channels=FEAT, cond_dim=COND,
                          out_channels=3, **ARCH)
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 8, 8, 8, FEAT), jnp.float32)
    k1, k2 = jax.random.split(rng)
    seg_p = seg.init(k1, x)["params"]
    cont_p = cont.init(k2, x)["params"]
    # zero-init convs would hide wiring mistakes behind zeros: randomize
    # every param (incl. out_conv/zero-init ones) for the equivalence check
    leaves, treedef = jax.tree.flatten((seg_p, cont_p))
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.1
              for k, l in zip(keys, leaves)]
    seg_p, cont_p = jax.tree.unflatten(treedef, leaves)
    return seg, cont, seg_p, cont_p, x


def _joint(**over):
    kw = dict(feature_channels=FEAT, cond_dim=COND, num_classes=5,
              cont_channels=3, **ARCH)
    kw.update(over)
    return JointMaterialUNet(**kw)


def test_joint_matches_separate(nets_and_params):
    seg, cont, seg_p, cont_p, x = nets_and_params
    joint = _joint()
    jp = fuse_material_unets(seg_p, cont_p, model_channels=ARCH["model_channels"],
                             channel_mult=ARCH["channel_mult"],
                             num_res_blocks=ARCH["num_res_blocks"])
    # fused tree must match the module's own init structure
    ref_shapes = jax.tree.map(
        lambda a: a.shape, joint.init(jax.random.PRNGKey(0), x)["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, jp)
    assert ref_shapes == got_shapes

    want_seg = seg.apply({"params": seg_p}, x)
    want_cont = cont.apply({"params": cont_p}, x)
    got_seg, got_cont = joint.apply({"params": jp}, x)
    np.testing.assert_allclose(got_seg, want_seg, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_cont, want_cont, rtol=2e-5, atol=2e-5)


def test_joint_matches_with_attention(nets_and_params):
    """Middle attention is always on; also exercise a level attention."""
    seg, cont, seg_p, cont_p, x = nets_and_params
    seg_a = SegmentationUNet(feature_channels=FEAT, cond_dim=COND,
                             num_classes=5, attention_resolutions=(2,), **ARCH)
    cont_a = RegressionUNet(feature_channels=FEAT, cond_dim=COND,
                            out_channels=3, attention_resolutions=(2,), **ARCH)
    rng = jax.random.PRNGKey(11)
    sp = seg_a.init(rng, x)["params"]
    cp = cont_a.init(jax.random.PRNGKey(12), x)["params"]
    leaves, treedef = jax.tree.flatten((sp, cp))
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.1
              for k, l in zip(keys, leaves)]
    sp, cp = jax.tree.unflatten(treedef, leaves)

    joint = _joint(attention_resolutions=(2,))
    jp = fuse_material_unets(sp, cp, model_channels=ARCH["model_channels"],
                             channel_mult=ARCH["channel_mult"],
                             num_res_blocks=ARCH["num_res_blocks"])
    got_seg, got_cont = joint.apply({"params": jp}, x)
    np.testing.assert_allclose(got_seg, seg_a.apply({"params": sp}, x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_cont, cont_a.apply({"params": cp}, x),
                               rtol=2e-5, atol=2e-5)


def test_attention_multihead_split_is_per_pack():
    """heads>1 channel-last head split must not mix spatial and channel."""
    from pixie_tpu.models.unet3d import AttentionBlock

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 4, 4, 16), jnp.float32)
    # a 2-pack attention over [a(8), b(8)] must equal two 8-channel blocks
    single = AttentionBlock(num_heads=1)
    pa = single.init(jax.random.PRNGKey(1), x[..., :8])["params"]
    pb = single.init(jax.random.PRNGKey(2), x[..., 8:])["params"]
    from pixie_tpu.models.joint import _fuse_attention

    packed = AttentionBlock(num_heads=1, n_pack=2)
    jp = jax.tree.map(jnp.asarray, _fuse_attention(
        jax.tree.map(np.asarray, pa), jax.tree.map(np.asarray, pb)))
    got = packed.apply({"params": jp}, x)
    want_a = single.apply({"params": pa}, x[..., :8])
    want_b = single.apply({"params": pb}, x[..., 8:])
    np.testing.assert_allclose(got[..., :8], want_a, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[..., 8:], want_b, rtol=2e-5, atol=2e-5)
