"""tcnn-layout compatibility: the JAX reimplementation vs an independent
NumPy implementation of the published tcnn semantics, plus converter
bookkeeping (pixie_tpu/recon/tcnn_compat.py)."""

import numpy as np
import pytest

import jax

from pixie_tpu.recon.tcnn_compat import (
    F3RM_GRID,
    F3RM_MLP,
    TcnnGridConfig,
    TcnnMLP,
    TcnnMLPConfig,
    TcnnNetworkWithInputEncoding,
    detect_layout,
    f3rm_feature_field,
    nerfacto_density_field,
    split_tcnn_params,
    tcnn_frequency_encoding,
)

_PRIMES = (1, 2654435761, 805459861)


def numpy_hashgrid(pts, table, cfg: TcnnGridConfig):
    """Independent per-point NumPy oracle of tcnn grid.h sampling."""
    n = len(pts)
    out = np.zeros((n, cfg.n_levels * cfg.features_per_level), np.float32)
    for level in range(cfg.n_levels):
        scale = cfg.level_scale(level)
        res = cfg.level_resolution(level)
        entries = cfg.level_entries(level)
        offset = cfg.level_offsets[level]
        hashed = cfg.level_is_hashed(level)
        for p in range(n):
            pos = pts[p] * scale + 0.5
            grid0 = np.floor(pos).astype(np.int64)
            frac = pos - grid0
            acc = np.zeros(cfg.features_per_level, np.float32)
            for corner in range(8):
                off = np.array([(corner >> d) & 1 for d in range(3)])
                cell = np.clip(grid0 + off, 0, res - 1)
                if hashed:
                    h = np.uint32(cell[0]) * np.uint32(_PRIMES[0])
                    h ^= np.uint32(np.uint32(cell[1]) * np.uint32(_PRIMES[1]))
                    h ^= np.uint32(np.uint32(cell[2]) * np.uint32(_PRIMES[2]))
                    idx = int(h % np.uint32(entries))
                else:
                    idx = int(cell[0] + cell[1] * res + cell[2] * res * res)
                w = np.prod(np.where(off == 1, frac, 1.0 - frac))
                acc += np.float32(w) * table[offset + idx]
            out[p, level * cfg.features_per_level:(level + 1) * cfg.features_per_level] = acc
    return out


class TestGridBookkeeping:
    def test_f3rm_grid_sizes(self):
        """12 levels, 16->128, 2^19 cap: coarse levels dense, fine hashed."""
        cfg = F3RM_GRID
        assert cfg.level_resolution(0) == 16
        assert cfg.level_resolution(cfg.n_levels - 1) == 128
        for l in range(cfg.n_levels):
            e = cfg.level_entries(l)
            assert e % 8 == 0
            assert e <= 1 << 19
        # 128^3 > 2^19 -> the finest level is hashed
        assert cfg.level_is_hashed(cfg.n_levels - 1)
        assert not cfg.level_is_hashed(0)

    def test_mlp_padding(self):
        assert F3RM_MLP.in_dim == 96 + 36
        assert F3RM_MLP.in_padded == 144
        assert F3RM_MLP.out_padded == 768
        assert F3RM_MLP.layer_shapes == ((64, 144), (64, 64), (768, 64))


class TestHashGridMatchesNumpyOracle:
    def test_small_grid(self):
        cfg = TcnnGridConfig.from_min_max(4, 2, 8, 4, 32)
        rng = np.random.default_rng(0)
        table = rng.normal(0, 0.1, (cfg.level_offsets[-1],
                                    cfg.features_per_level)).astype(np.float32)
        pts = rng.uniform(0.01, 0.99, (50, 3)).astype(np.float32)
        net = TcnnNetworkWithInputEncoding(
            cfg, TcnnMLPConfig(in_dim=cfg.out_dim, out_dim=4), pe_n_freq=0
        )
        from pixie_tpu.recon.tcnn_compat import TcnnHashGrid

        got = TcnnHashGrid(cfg).apply({"params": {"table": table}}, pts)
        expect = numpy_hashgrid(pts, table, cfg)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-6)

    def test_f3rm_grid_shape(self):
        cfg = F3RM_GRID
        rng = np.random.default_rng(1)
        table = rng.normal(0, 1e-4, (cfg.level_offsets[-1],
                                     cfg.features_per_level)).astype(np.float32)
        pts = rng.uniform(0, 1, (16, 3)).astype(np.float32)
        from pixie_tpu.recon.tcnn_compat import TcnnHashGrid

        got = TcnnHashGrid(cfg).apply({"params": {"table": table}}, pts)
        assert got.shape == (16, 96)
        # spot-check one level against the oracle
        expect = numpy_hashgrid(pts, table, cfg)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-8)


class TestFrequencyEncoding:
    def test_tcnn_layout(self):
        """dim-major, per-freq (sin, cos), angle = x * 2^f * pi."""
        x = np.array([[0.25, 0.5, 0.75]], np.float32)
        enc = np.asarray(tcnn_frequency_encoding(x, 2))
        assert enc.shape == (1, 12)
        np.testing.assert_allclose(enc[0, 0], np.sin(0.25 * np.pi), rtol=1e-6)
        np.testing.assert_allclose(enc[0, 1], np.cos(0.25 * np.pi), rtol=1e-6)
        np.testing.assert_allclose(enc[0, 2], np.sin(0.25 * 2 * np.pi), rtol=1e-6, atol=1e-6)
        # dim 1 starts at index 4
        np.testing.assert_allclose(enc[0, 4], np.sin(0.5 * np.pi), rtol=1e-6)


class TestConverter:
    def test_split_roundtrip_and_apply(self):
        cfg = TcnnGridConfig.from_min_max(4, 2, 10, 4, 32)
        mlp = TcnnMLPConfig(in_dim=cfg.out_dim, out_dim=8, hidden=16,
                            n_hidden_layers=2)
        rng = np.random.default_rng(2)
        net_flat = rng.normal(0, 0.3, mlp.n_params).astype(np.float32)
        enc_flat = rng.uniform(-1e-4, 1e-4, cfg.n_params).astype(np.float32)
        flat = np.concatenate([net_flat, enc_flat])
        params = split_tcnn_params(flat, cfg, mlp)  # autodetect
        assert params["grid"]["table"].shape == (cfg.level_offsets[-1], 2)
        np.testing.assert_array_equal(
            np.asarray(params["mlp"]["w0"]).ravel(),
            net_flat[: 16 * mlp.in_padded],
        )
        module = TcnnNetworkWithInputEncoding(cfg, mlp, pe_n_freq=0)
        pts = rng.uniform(0, 1, (32, 3)).astype(np.float32)
        out = module.apply({"params": params}, pts)
        assert out.shape == (32, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_layout_autodetect(self):
        rng = np.random.default_rng(3)
        net = rng.normal(0, 0.3, 1000).astype(np.float32)
        enc = rng.uniform(-1e-4, 1e-4, 5000).astype(np.float32)
        assert detect_layout(np.concatenate([net, enc]), 1000, 5000) is True
        assert detect_layout(np.concatenate([enc, net]), 1000, 5000) is False

    def test_size_mismatch_raises(self):
        cfg = TcnnGridConfig.from_min_max(4, 2, 10, 4, 32)
        mlp = TcnnMLPConfig(in_dim=cfg.out_dim, out_dim=8, hidden=16)
        with pytest.raises(ValueError, match="expected"):
            split_tcnn_params(np.zeros(10, np.float32), cfg, mlp)

    def test_f3rm_and_nerfacto_module_constructors(self):
        ff = f3rm_feature_field()
        assert ff.pe_n_freq == 6 and ff.mlp.out_dim == 768
        nf = nerfacto_density_field()
        assert nf.mlp.out_dim == 16  # 1 density + 15 geo
        assert nf.grid.n_levels == 16

    def test_mlp_ones_padding_gives_bias(self):
        """The 1.0-padded inputs act as a first-layer bias."""
        mlp = TcnnMLPConfig(in_dim=10, out_dim=4, hidden=16, n_hidden_layers=1)
        rng = np.random.default_rng(4)
        w0 = np.zeros((16, 16), np.float32)
        w0[:, 10:] = 1.0  # weights on the padded columns only
        w1 = rng.normal(0, 0.1, (16, 16)).astype(np.float32)
        x = np.zeros((2, 10), np.float32)
        out = TcnnMLP(mlp).apply({"params": {"w0": w0, "w1": w1}}, x)
        # zero input, but ones-padding flows through: output nonzero
        assert np.abs(np.asarray(out)).max() > 0


class TestGoldenGated:
    def test_real_checkpoint_roundtrip(self):
        """Network-gated: convert a real reference f3rm checkpoint when one
        has been downloaded (scripts/download_data.py)."""
        from pathlib import Path

        ckpts = sorted(Path("/root/repo/models").glob("**/nerfstudio_models/step-*.ckpt"))
        if not ckpts:
            pytest.skip("no downloaded f3rm checkpoint (zero-egress env)")
        from pixie_tpu.recon.tcnn_compat import load_f3rm_checkpoint

        fields = load_f3rm_checkpoint(ckpts[-1])
        adapter_pts = np.random.default_rng(0).uniform(-0.4, 0.4, (64, 3))
        from pixie_tpu.recon.tcnn_compat import TcnnFieldAdapter

        adapter = TcnnFieldAdapter(fields)
        out = adapter.query(adapter_pts)
        assert out["feature"].shape == (64, 768)
        assert np.isfinite(np.asarray(out["feature"])).all()
