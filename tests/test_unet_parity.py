"""Numerical parity of the flax U-Net against the reference torch modules.

Imports the reference implementation read-only from /root/reference (skipped
when unavailable), random-initializes it, converts the state_dict with
convert_torch, and compares forward passes element-wise.  This validates both
the architecture transcription and the checkpoint converter.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT

torch = pytest.importorskip("torch")

WAVELET = REFERENCE_ROOT / "third_party" / "Wavelet-Generation"
if not WAVELET.exists():
    pytest.skip("reference not mounted", allow_module_level=True)
if str(WAVELET) not in sys.path:
    sys.path.insert(0, str(WAVELET))

from models.module.diffusion_network import (  # noqa: E402  (reference, read-only)
    FeatureProjector as TorchProjector,
    MyUNetModel as TorchUNet,
)

from pixie_tpu.models.convert_torch import convert_state_dict  # noqa: E402
from pixie_tpu.models.unet3d import SegmentationUNet  # noqa: E402


class TorchHead(torch.nn.Module):
    """Reference SegmentationUNet structure (training_discrete.py:50-88)."""

    def __init__(self, feature_channels, cond_dim, model_channels, num_res_blocks,
                 channel_mult, grid_size, num_classes):
        super().__init__()
        hidden = 128 if feature_channels > cond_dim else None
        self.projector = TorchProjector(
            feature_channels, out_channels=cond_dim, hidden_channels=hidden
        )
        self.unet = TorchUNet(
            in_channels=cond_dim,
            model_channels=model_channels,
            out_channels=num_classes,
            num_res_blocks=num_res_blocks,
            channel_mult=channel_mult,
            attention_resolutions=[],
            spatial_size=grid_size,
            dims=3,
            activation=torch.nn.LeakyReLU(0.02),
        )

    def forward(self, x):
        return self.unet(self.projector(x))


@pytest.mark.parametrize("grid,mult,res_blocks,fc", [
    (16, (1, 2), 1, 48),
    (16, (1, 1, 2), 2, 48),
])
def test_forward_parity_random_weights(grid, mult, res_blocks, fc):
    torch.manual_seed(0)
    cond_dim, model_ch, classes = 32, 16, 8

    tmodel = TorchHead(fc, cond_dim, model_ch, res_blocks, mult, grid, classes)
    tmodel.eval()
    # perturb zero-initialized convs so the test exercises every weight
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    x = torch.randn(2, fc, grid, grid, grid)
    with torch.no_grad():
        ref = tmodel(x).numpy()  # (N, C, D, H, W)

    params = convert_state_dict(
        tmodel.state_dict(), num_res_blocks=res_blocks, channel_mult=mult
    )
    jmodel = SegmentationUNet(
        feature_channels=fc, cond_dim=cond_dim, model_channels=model_ch,
        num_res_blocks=res_blocks, channel_mult=mult, grid_size=grid,
        num_classes=classes,
    )
    xj = np.transpose(x.numpy(), (0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    out = jmodel.apply(params, xj)
    out_ncdhw = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))

    np.testing.assert_allclose(out_ncdhw, ref, atol=2e-4, rtol=1e-3)


def test_param_count_matches():
    grid, mult, res_blocks, fc = 16, (1, 2), 1, 48
    tmodel = TorchHead(fc, 32, 16, res_blocks, mult, grid, 8)
    n_torch = sum(p.numel() for p in tmodel.parameters())
    params = convert_state_dict(tmodel.state_dict(), num_res_blocks=res_blocks,
                                channel_mult=mult)
    import jax

    n_jax = sum(np.asarray(x).size for x in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_full_size_config_converts():
    """The production config (64^3, mult (1,1,2,4), 3 res blocks) converts and
    runs a forward pass."""
    torch.manual_seed(1)
    tmodel = TorchHead(768, 32, 64, 3, (1, 1, 2, 4), 64, 8)
    params = convert_state_dict(tmodel.state_dict())
    jmodel = SegmentationUNet()
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 64, 768)).astype(np.float32)
    out = jmodel.apply(params, x)
    assert out.shape == (1, 64, 64, 64, 8)
    assert np.isfinite(np.asarray(out)).all()


class TestConv3DVia2D:
    def test_matches_native_conv3d(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        import pixie_tpu.models.unet3d as U

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 9, 9, 9, 6)).astype(np.float32))
        for strides in (1, 2):
            ref = U.nn.Conv(5, kernel_size=(3, 3, 3),
                            strides=(strides,) * 3,
                            padding=[(1, 1)] * 3, name="c")
            p = ref.init(jax.random.PRNGKey(1), x)
            p = jax.tree_util.tree_map(
                lambda a: a + 0.1 * np.random.default_rng(0)
                .normal(size=a.shape).astype(a.dtype), p)
            got = U._Conv3DVia2D(5, strides=strides, name="c").apply(p, x)
            want = ref.apply(p, x)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5)
