"""tiny-cuda-nn checkpoint compatibility: exact-layout JAX reimplementation.

The reference trains its fields with tcnn (f3rm/feature_field.py:71-82
``tcnn.NetworkWithInputEncoding``; nerfstudio MLPWithHashEncoding,
field_components/mlp.py:251-269) and its checkpoints store each field as ONE
flat parameter vector.  To run reference-trained checkpoints on TPU we
reproduce tcnn's exact inference semantics (hashgrid indexing, frequency
encoding layout, padded no-bias MLP) and split the flat vector.

tcnn semantics implemented here (tiny-cuda-nn grid.h / frequency.h /
fully_fused_mlp.cu, as published):

  * per-level scale_l = base_resolution * growth^l - 1;
    resolution_l = ceil(scale_l) + 1
  * entries per level = next_multiple(min(resolution^3, 2^log2_hashmap), 8)
  * sampling: pos = x * scale + 0.5; floor/fract; trilinear over 8 corners
  * dense index (stride: dim0 fastest) when resolution^3 fits the table,
    else xor-hash with primes (1, 2654435761, 805459861), modulo entries
  * frequency encoding: per dim, per frequency, (sin, cos) with
    angle = x * 2^f * pi — dim-major layout
  * MLP: no biases, widths padded to multiples of 16, weights stored as
    row-major (out_width, in_width) matrices concatenated layer by layer;
    encoding outputs padded to the MLP input width with ONES (tcnn pads
    encoded inputs with 1.0)
  * the flat buffer is [network params | encoding params] (network first)

The network-first order and the 1.0-padding convention are validated at load
time by ``detect_layout`` (hash tables are U(-1e-4,1e-4)-initialized and stay
orders of magnitude smaller than MLP weights) and by the network-gated golden
test against reference artifacts (tests/test_tcnn_golden.py).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_PRIMES = (1, 2654435761, 805459861)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class TcnnGridConfig:
    """HashGrid hyperparameters (tcnn encoding_config)."""

    n_levels: int = 12
    features_per_level: int = 8
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    growth: float = 1.0  # per_level_scale

    @classmethod
    def from_min_max(cls, n_levels, features_per_level, log2_hashmap_size,
                     base_resolution, max_resolution) -> "TcnnGridConfig":
        growth = (
            float(np.exp((np.log(max_resolution) - np.log(base_resolution))
                         / (n_levels - 1)))
            if n_levels > 1 else 1.0
        )
        return cls(n_levels, features_per_level, log2_hashmap_size,
                   base_resolution, growth)

    def level_scale(self, level: int) -> float:
        # tcnn grid.h: scale = exp2(level * log2_per_level_scale) * base - 1
        return float(
            np.exp2(level * np.log2(self.growth)) * self.base_resolution - 1.0
        )

    def level_resolution(self, level: int) -> int:
        return int(np.ceil(self.level_scale(level))) + 1

    def level_entries(self, level: int) -> int:
        res = self.level_resolution(level)
        dense = res ** 3
        capped = min(dense, 1 << self.log2_hashmap_size)
        return _next_multiple(capped, 8)

    def level_is_hashed(self, level: int) -> bool:
        res = self.level_resolution(level)
        return res ** 3 > (1 << self.log2_hashmap_size)

    @property
    def level_offsets(self) -> tuple[int, ...]:
        offs, acc = [], 0
        for l in range(self.n_levels):
            offs.append(acc)
            acc += self.level_entries(l)
        return tuple(offs + [acc])

    @property
    def n_params(self) -> int:
        return self.level_offsets[-1] * self.features_per_level

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.features_per_level


class TcnnHashGrid(nn.Module):
    """HashGrid encoding with tcnn-exact indexing.

    param "table": (total_entries, features_per_level), levels concatenated
    (entry-major, features contiguous — tcnn's grid layout).
    """

    config: TcnnGridConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        table = self.param(
            "table",
            lambda key, shape: (jnp.zeros(shape, jnp.float32)),
            (cfg.level_offsets[-1], cfg.features_per_level),
        )
        batch_shape = x.shape[:-1]
        pts = x.reshape(-1, 3).astype(jnp.float32)

        outs = []
        for level in range(cfg.n_levels):
            scale = cfg.level_scale(level)
            res = cfg.level_resolution(level)
            entries = cfg.level_entries(level)
            offset = cfg.level_offsets[level]
            hashed = cfg.level_is_hashed(level)

            pos = pts * scale + 0.5
            floor = jnp.floor(pos)
            frac = pos - floor
            floor_i = floor.astype(jnp.int32)

            feats = jnp.zeros((pts.shape[0], cfg.features_per_level), jnp.float32)
            for corner in range(8):
                off = jnp.array(
                    [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                    jnp.int32,
                )
                cell = jnp.clip(floor_i + off, 0, res - 1)
                if hashed:
                    c = cell.astype(jnp.uint32)
                    h = c[..., 0] * jnp.uint32(_PRIMES[0])
                    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
                    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
                    idx = jnp.remainder(h, jnp.uint32(entries)).astype(jnp.int32)
                else:
                    # dense stride: dim 0 fastest (tcnn grid_index)
                    idx = (cell[..., 0] + cell[..., 1] * res
                           + cell[..., 2] * res * res)
                w = jnp.prod(
                    jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
                )
                feats = feats + w[:, None] * table[offset + idx]
            outs.append(feats)

        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(*batch_shape, cfg.out_dim)


def tcnn_frequency_encoding(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """tcnn Frequency encoding: dim-major, per-freq (sin, cos),
    angle = x * 2^f * pi (frequency.h)."""
    freqs = (2.0 ** jnp.arange(n_frequencies, dtype=jnp.float32)) * jnp.pi
    ang = x[..., :, None] * freqs  # (..., d, F)
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    pairs = jnp.stack([sin, cos], axis=-1)  # (..., d, F, 2)
    return pairs.reshape(*x.shape[:-1], x.shape[-1] * n_frequencies * 2)


@dataclasses.dataclass(frozen=True)
class TcnnMLPConfig:
    """FullyFusedMLP widths (no biases; padded to multiples of 16)."""

    in_dim: int          # unpadded encoding output width
    out_dim: int         # unpadded network output width
    hidden: int = 64
    n_hidden_layers: int = 2

    @property
    def in_padded(self) -> int:
        return _next_multiple(self.in_dim, 16)

    @property
    def out_padded(self) -> int:
        return _next_multiple(self.out_dim, 16)

    @property
    def layer_shapes(self) -> tuple[tuple[int, int], ...]:
        """(out, in) row-major matrices, input layer first."""
        shapes = [(self.hidden, self.in_padded)]
        for _ in range(self.n_hidden_layers - 1):
            shapes.append((self.hidden, self.hidden))
        shapes.append((self.out_padded, self.hidden))
        return tuple(shapes)

    @property
    def n_params(self) -> int:
        return sum(o * i for o, i in self.layer_shapes)


class TcnnMLP(nn.Module):
    """ReLU MLP with tcnn's padded, bias-free layout.

    ``pad_value``: value used to pad the input to the padded width — 1.0 for
    encoding-fed networks (tcnn pads encoded outputs with ones, giving the
    first layer an effective bias); golden-test-verifiable.
    """

    config: TcnnMLPConfig
    pad_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        pad = cfg.in_padded - x.shape[-1]
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((*x.shape[:-1], pad), self.pad_value, x.dtype)],
                axis=-1,
            )
        for li, (o, i) in enumerate(cfg.layer_shapes):
            w = self.param(f"w{li}", nn.initializers.zeros, (o, i))
            x = x @ w.T
            if li < len(cfg.layer_shapes) - 1:
                x = jnp.maximum(x, 0.0)
        return x[..., : cfg.out_dim]


class TcnnNetworkWithInputEncoding(nn.Module):
    """HashGrid [+ Frequency PE] -> FullyFusedMLP, tcnn-layout-exact.

    Mirrors f3rm FeatureField (feature_field.py:46-83: Composite of HashGrid
    + Frequency(6) into FullyFusedMLP 64x2 -> feature_dim) and nerfstudio's
    MLPWithHashEncoding (no PE) depending on ``pe_n_freq``.
    """

    grid: TcnnGridConfig
    mlp: TcnnMLPConfig
    pe_n_freq: int = 0

    @nn.compact
    def __call__(self, x):
        enc = TcnnHashGrid(self.grid, name="grid")(x)
        if self.pe_n_freq:
            enc = jnp.concatenate(
                [enc, tcnn_frequency_encoding(x, self.pe_n_freq)], axis=-1
            )
        return TcnnMLP(self.mlp, name="mlp")(enc)


# ---------------------------------------------------------------------------
# flat-buffer conversion
# ---------------------------------------------------------------------------

def detect_layout(flat: np.ndarray, n_net: int, n_enc: int) -> bool:
    """True if the buffer is [network | encoding].

    Hash tables are initialized U(-1e-4, 1e-4) and stay orders of magnitude
    smaller than Xavier-initialized MLP weights; compare the dispersion of
    the head against the tail.
    """
    head = flat[: min(n_net, n_enc)]
    tail = flat[-min(n_net, n_enc):]
    return float(np.abs(head).mean()) >= float(np.abs(tail).mean())


def split_tcnn_params(
    flat: np.ndarray,
    grid: TcnnGridConfig,
    mlp: TcnnMLPConfig,
    network_first: bool | None = None,
) -> dict:
    """Flat tcnn buffer -> params pytree for TcnnNetworkWithInputEncoding."""
    flat = np.asarray(flat, np.float32).ravel()
    n_net, n_enc = mlp.n_params, grid.n_params
    if flat.size != n_net + n_enc:
        raise ValueError(
            f"tcnn buffer has {flat.size} params; expected "
            f"{n_net} (network) + {n_enc} (encoding) = {n_net + n_enc}"
        )
    if network_first is None:
        network_first = detect_layout(flat, n_net, n_enc)
        logging.info("tcnn layout autodetect: network_first=%s", network_first)
    net_flat, enc_flat = (
        (flat[:n_net], flat[n_net:]) if network_first
        else (flat[n_enc:], flat[:n_enc])
    )
    table = enc_flat.reshape(grid.level_offsets[-1], grid.features_per_level)
    mlp_params, off = {}, 0
    for li, (o, i) in enumerate(mlp.layer_shapes):
        mlp_params[f"w{li}"] = net_flat[off: off + o * i].reshape(o, i)
        off += o * i
    return {
        "grid": {"table": jnp.asarray(table)},
        "mlp": {k: jnp.asarray(v) for k, v in mlp_params.items()},
    }


# ---------------------------------------------------------------------------
# f3rm / nerfacto checkpoint loading
# ---------------------------------------------------------------------------

F3RM_GRID = TcnnGridConfig.from_min_max(12, 8, 19, 16, 128)
F3RM_MLP = TcnnMLPConfig(
    in_dim=F3RM_GRID.out_dim + 3 * 6 * 2,  # hashgrid 96 + frequency PE 36
    out_dim=768, hidden=64, n_hidden_layers=2,
)


def f3rm_feature_field() -> TcnnNetworkWithInputEncoding:
    """The reference CLIP feature field (feature_field.py:20-83)."""
    return TcnnNetworkWithInputEncoding(F3RM_GRID, F3RM_MLP, pe_n_freq=6)


def nerfacto_density_field(num_levels=16, features_per_level=2,
                           log2_hashmap_size=19, base_res=16, max_res=2048,
                           hidden_dim=64, num_layers=2, geo_feat_dim=15):
    """Nerfacto's mlp_base (nerfacto_field.py:134-146): hashgrid -> MLP ->
    (density_before_activation, geo_feat)."""
    grid = TcnnGridConfig.from_min_max(
        num_levels, features_per_level, log2_hashmap_size, base_res, max_res
    )
    mlp = TcnnMLPConfig(in_dim=grid.out_dim, out_dim=1 + geo_feat_dim,
                        hidden=hidden_dim, n_hidden_layers=num_layers - 1)
    return TcnnNetworkWithInputEncoding(grid, mlp, pe_n_freq=0)


def find_tcnn_buffers(state_dict: dict) -> dict:
    """Locate flat tcnn buffers in a nerfstudio checkpoint state dict."""
    out = {}
    for key, value in state_dict.items():
        if key.endswith("feature_field.field.params"):
            out["feature_field"] = np.asarray(value, np.float32)
        elif key.endswith("field.mlp_base.model.params") or key.endswith(
            "field.mlp_base.params"
        ):
            out["mlp_base"] = np.asarray(value, np.float32)
        elif "mlp_head" in key and key.endswith("params"):
            out["mlp_head"] = np.asarray(value, np.float32)
        elif key.endswith("embedding_appearance.embedding.weight"):
            out["appearance"] = np.asarray(value, np.float32)
    return out


NERFACTO_HEAD_MLP = TcnnMLPConfig(
    # SH degree-4 dirs (16) + geo_feat (15) + appearance embedding (32)
    in_dim=16 + 15 + 32, out_dim=3, hidden=64, n_hidden_layers=2,
)


class TcnnFieldAdapter:
    """World-space query adapter over converted tcnn fields — the duck-type
    the voxelizer consumes (f3rm_robot/field_adapter.py:28-72 semantics:
    density from nerfacto's mlp_base with trunc-exp activation, CLIP features
    from the feature field, RGB from the SH-direction color head with the
    average appearance embedding as nerfstudio eval does,
    nerfacto_field.py:253-257)."""

    def __init__(self, fields: dict, world_to_nerf_scale: float = 1.0,
                 world_to_nerf_transform: np.ndarray | None = None,
                 average_init_density: float = 1.0):
        import jax  # noqa: PLC0415

        self.fields = fields
        self.scale = float(world_to_nerf_scale)
        self.transform = (
            np.asarray(world_to_nerf_transform, np.float32)
            if world_to_nerf_transform is not None else None
        )
        feat = fields["feature_field"]
        base = fields.get("mlp_base")
        head = fields.get("mlp_head")
        appearance = fields.get("appearance")

        @jax.jit
        def _query(pts01):
            feature = feat["module"].apply({"params": feat["params"]}, pts01)
            if base is None:
                density = jnp.ones((*pts01.shape[:-1], 1), jnp.float32)
            else:
                h = base["module"].apply({"params": base["params"]}, pts01)
                density = average_init_density * jnp.exp(
                    jnp.clip(h[..., :1], -15.0, 15.0)
                )
            return density, feature

        @jax.jit
        def _rgb(pts01):
            if base is None or head is None:
                return jnp.full((*pts01.shape[:-1], 3), 0.5, jnp.float32)
            h = base["module"].apply({"params": base["params"]}, pts01)
            geo = h[..., 1:16]
            from pixie_tpu.recon.hashgrid import sh_encoding  # noqa: PLC0415

            d = sh_encoding(jnp.zeros_like(pts01), degree=4)
            emb = (jnp.broadcast_to(appearance["mean"],
                                    (*pts01.shape[:-1], appearance["dim"]))
                   if appearance is not None else
                   jnp.zeros((*pts01.shape[:-1], 32), jnp.float32))
            x = jnp.concatenate([d, geo, emb], axis=-1)
            return jax.nn.sigmoid(head["module"].apply({"params": head["params"]}, x))

        self._query_fn = _query
        self._rgb_fn = _rgb

    def _to_nerf01(self, world_points):
        p = np.asarray(world_points, np.float32)
        if self.transform is not None:
            ph = np.concatenate([p, np.ones((len(p), 1), np.float32)], axis=1)
            p = (self.transform @ ph.T).T[:, :3]
        p = p * self.scale
        # nerfstudio SceneBox normalization over the [-1,1] aabb
        return jnp.asarray(p * 0.5 + 0.5)

    def query(self, world_points):
        density, feature = self._query_fn(self._to_nerf01(world_points))
        return {"density": density, "feature": feature}

    def get_density(self, world_points):
        return self.query(world_points)["density"]

    def get_alpha(self, world_points, delta: float):
        return 1.0 - jnp.exp(-self.get_density(world_points) * delta)

    def get_rgb(self, world_points):
        return self._rgb_fn(self._to_nerf01(world_points))


def load_f3rm_checkpoint(ckpt_path: str | Path, network_first: bool | None = None):
    """Load a nerfstudio/f3rm ``step-*.ckpt`` and convert the feature field
    (and nerfacto density field when present) to JAX param trees.

    Returns {"feature_field": {module, params}, "mlp_base": {...}?}.
    """
    import torch  # noqa: PLC0415

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("pipeline", ckpt)
    state = {k: v for k, v in state.items() if hasattr(v, "numpy")}
    buffers = find_tcnn_buffers(
        {k: v.float().numpy() for k, v in state.items()}
    )
    if "feature_field" not in buffers:
        raise KeyError(
            f"no feature_field.field.params in {ckpt_path}; keys tail: "
            f"{sorted(state)[-5:]}"
        )
    out = {}
    module = f3rm_feature_field()
    out["feature_field"] = {
        "module": module,
        "params": split_tcnn_params(buffers["feature_field"], F3RM_GRID,
                                    F3RM_MLP, network_first),
    }
    if "mlp_base" in buffers:
        flat = buffers["mlp_base"]
        # infer max_res by matching the total param count over the
        # nerfacto config space (max_res is the only free knob)
        for max_res in (2048, 1024, 4096, 8192, 512):
            mod = nerfacto_density_field(max_res=max_res)
            try:
                params = split_tcnn_params(flat, mod.grid, mod.mlp,
                                           network_first)
            except ValueError:
                continue
            out["mlp_base"] = {"module": mod, "params": params}
            break
        else:
            logging.warning("mlp_base buffer size matches no known nerfacto "
                            "config; skipping density field")
    if "mlp_head" in buffers:
        head_mlp = TcnnMLPConfig(
            in_dim=NERFACTO_HEAD_MLP.in_dim, out_dim=3, hidden=64,
            n_hidden_layers=2,
        )
        flat = np.asarray(buffers["mlp_head"], np.float32).ravel()
        if flat.size == head_mlp.n_params:
            mlp_params, off = {}, 0
            for li, (o, i) in enumerate(head_mlp.layer_shapes):
                mlp_params[f"w{li}"] = jnp.asarray(
                    flat[off: off + o * i].reshape(o, i))
                off += o * i
            out["mlp_head"] = {"module": TcnnMLP(head_mlp),
                               "params": mlp_params}
        else:
            logging.warning("mlp_head buffer size %d matches no known config",
                            flat.size)
    if "appearance" in buffers:
        emb = np.asarray(buffers["appearance"], np.float32)
        # eval-time nerfstudio uses the MEAN appearance embedding
        # (nerfacto_field.py:253-257, use_average_appearance_embedding)
        out["appearance"] = {"mean": jnp.asarray(emb.mean(axis=0)),
                             "dim": emb.shape[1]}
    return out
