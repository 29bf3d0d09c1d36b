"""U-Net trainers: discrete material segmentation and continuous regression.

TPU-native replacement for the reference's DDP training scripts
(trainer/training_discrete.py:103-330 and training_continuous_mse.py:130-390):

  * torch DDP + DistributedSampler + NCCL allreduce  ->  one jitted train
    step with the batch sharded over the mesh 'dp' axis (NamedSharding);
    XLA inserts the gradient psum;
  * AMP GradScaler -> bf16 compute / fp32 params via flax dtype policy
    (TPU-native mixed precision needs no loss scaling);
  * Adam lr 1e-4 beta (0.9, 0.999) + ExponentialLR gamma 0.998 per epoch
    (config/training/default.yaml:57-66);
  * masked CE with ignore_index=background (training_discrete.py:224) and
    foreground-masked MSE (training_continuous_mse.py:103-126);
  * epoch checkpoints via orbax, eval every 10 epochs, deterministic
    0.9/0.1 split persisted to JSON.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

from pixie_tpu.models.unet3d import RegressionUNet, SegmentationUNet
from pixie_tpu.parallel.mesh import (get_mesh, get_pod_mesh,
                                     initialize_distributed)
from pixie_tpu.train.data import MaterialVoxelDataset, save_splits, train_test_split
from pixie_tpu.utils.metrics import compute_accuracy, masked_mean


@dataclasses.dataclass
class TrainConfig:
    mode: str = "discrete"  # "discrete" | "continuous"
    feature_channels: int = 768
    cond_dim: int = 32
    model_channels: int = 64
    num_res_blocks: int = 3
    channel_mult: tuple = (1, 1, 2, 4)
    attention_resolutions: tuple = ()
    grid_size: int = 64
    num_classes: int = 8
    background_id: int = 7
    batch_size: int = 4           # global batch (reference: 4 per GPU x world)
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    lr_decay: bool = True
    lr_decay_rate: float = 0.998
    epochs: int = 300
    seed: int = 69
    train_size: float = 0.9
    eval_interval: int = 10
    save_interval: int = 10
    lambda_cont: float = 1.0
    grad_clip: float | None = None


def build_model(cfg: TrainConfig):
    common = dict(
        feature_channels=cfg.feature_channels,
        cond_dim=cfg.cond_dim,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        channel_mult=tuple(cfg.channel_mult),
        attention_resolutions=tuple(cfg.attention_resolutions),
        grid_size=cfg.grid_size,
    )
    if cfg.mode == "discrete":
        return SegmentationUNet(num_classes=cfg.num_classes, **common)
    return RegressionUNet(out_channels=3, **common)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    if cfg.lr_decay:
        # ExponentialLR steps per EPOCH in the reference (training_discrete.py:268)
        sched = optax.exponential_decay(
            cfg.lr, transition_steps=max(steps_per_epoch, 1),
            decay_rate=cfg.lr_decay_rate, staircase=True,
        )
    else:
        sched = cfg.lr
    tx = optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def discrete_loss(logits, mat_id, mask, background_id: int, sample_w=None):
    """Masked CE with ignore_index=background (training_discrete.py:224).
    sample_w (B,) zeroes padded samples added for dp-divisibility."""
    valid = (mat_id != background_id).astype(jnp.float32)
    if sample_w is not None:
        valid = valid * sample_w[:, None, None, None]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(mat_id, logits.shape[-1], dtype=logits.dtype)
    ce = -(onehot * logp).sum(-1)
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def continuous_loss(pred, cont_gt, mask, lambda_cont: float = 1.0, sample_w=None):
    """Foreground-masked MSE (training_continuous_mse.py:103-126).
    pred/cont_gt: (N,D,H,W,3); mask (N,D,H,W)."""
    fg = mask[..., None]
    diff_sq = (pred - cont_gt) ** 2
    per_sample = masked_mean(diff_sq, jnp.broadcast_to(fg, diff_sq.shape), (1, 2, 3))
    if sample_w is not None:
        loss = (per_sample.mean(-1) * sample_w).sum() / jnp.maximum(sample_w.sum(), 1.0)
        loss = loss * lambda_cont
    else:
        loss = per_sample.mean() * lambda_cont
    aux = {
        "density_mse": masked_mean(diff_sq[..., 0:1], fg, (1, 2, 3)).mean(),
        "youngs_mse": masked_mean(diff_sq[..., 1:2], fg, (1, 2, 3)).mean(),
        "poisson_mse": masked_mean(diff_sq[..., 2:3], fg, (1, 2, 3)).mean(),
    }
    return loss, aux


class Trainer:
    """Mesh-sharded trainer driving either U-Net."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        if mesh is None:
            # multi-host: join the pod runtime first (no-op single-host),
            # then span the global device set (training_utils.py:50-55
            # ddp_setup equivalent)
            initialize_distributed()
            mesh = get_pod_mesh()
        self.mesh = mesh
        self.model = build_model(cfg)
        self.tx = None
        self.params = None
        self.opt_state = None
        self._step_fn = None
        self.epoch = 0

    # -- init / checkpointing -------------------------------------------------
    def init_params(self, rng_seed: int | None = None):
        rng = jax.random.PRNGKey(self.cfg.seed if rng_seed is None else rng_seed)
        dummy = jnp.zeros(
            (1, self.cfg.grid_size, self.cfg.grid_size, self.cfg.grid_size,
             self.cfg.feature_channels), jnp.float32,
        )
        variables = self.model.init(rng, dummy)
        self.params = variables["params"]
        return self.params

    def setup(self, steps_per_epoch: int, params=None):
        if params is not None:
            self.params = params
        if self.params is None:
            self.init_params()
        self.tx = make_optimizer(self.cfg, steps_per_epoch)
        self.opt_state = self.tx.init(self.params)
        # replicate params/opt over mesh; shard batch over dp
        repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(self.params, repl)
        self.opt_state = jax.device_put(self.opt_state, repl)
        self._build_step()

    def _build_step(self):
        cfg = self.cfg
        model = self.model
        tx = self.tx
        data_sharding = NamedSharding(self.mesh, P("dp"))
        repl = NamedSharding(self.mesh, P())

        if cfg.mode == "discrete":

            def loss_fn(params, feat, mat_id, mask, sample_w):
                logits = model.apply({"params": params}, feat)
                loss = discrete_loss(logits, mat_id, mask, cfg.background_id, sample_w)
                acc = compute_accuracy(
                    jnp.moveaxis(logits, -1, 1), mat_id, mask=None,
                    ignore_index=cfg.background_id,
                )
                return loss, {"accuracy": acc}
        else:

            def loss_fn(params, feat, cont, mask, sample_w):
                pred = model.apply({"params": params}, feat)
                return continuous_loss(pred, cont, mask, cfg.lambda_cont, sample_w)

        @jax.jit
        def step(params, opt_state, *batch):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, *batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self._step_fn = step
        self._data_sharding = data_sharding
        self._repl = repl

    def _batch_sharding(self, ndim: int) -> NamedSharding:
        """Batch over dp; voxel z-axis over sp when the mesh has one.

        Spatial (z) sharding rides XLA GSPMD auto-partitioning: the convs get
        halo exchanges, the spatial-LayerNorm reductions an sp-axis psum —
        nothing model-side changes.  This replaces the reference's
        DDP-batch-only parallelism (training_utils.py:50-55) with dp x sp.
        """
        if ndim >= 4 and self.mesh.shape.get("sp", 1) > 1:
            spec = P("dp", "sp", *([None] * (ndim - 2)))
        else:
            spec = P("dp", *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def _pad_batch(self, batch):
        """Pad the global batch to a multiple of the dp axis; returns sample
        weights zeroing the padded rows (replaces DistributedSampler padding)."""
        dp = self.mesh.shape["dp"]
        b = batch[0].shape[0]
        pad = (-b) % dp
        w = np.ones(b + pad, np.float32)
        if pad:
            batch = tuple(np.concatenate([x, np.repeat(x[-1:], pad, 0)]) for x in batch)
            w[b:] = 0.0
        return batch, w

    def train_step(self, batch) -> tuple[float, dict]:
        batch = tuple(np.asarray(b) for b in batch)
        batch, w = self._pad_batch(batch)
        batch = tuple(
            jax.device_put(jnp.asarray(b), self._batch_sharding(b.ndim))
            for b in batch
        ) + (jax.device_put(jnp.asarray(w), NamedSharding(self.mesh, P("dp"))),)
        self.params, self.opt_state, loss, aux = self._step_fn(
            self.params, self.opt_state, *batch
        )
        return loss, aux

    def eval_step(self, batch) -> dict:
        cfg = self.cfg
        batch = tuple(np.asarray(b) for b in batch)
        batch, _ = self._pad_batch(batch)
        feat = jax.device_put(jnp.asarray(batch[0]),
                              self._batch_sharding(batch[0].ndim))
        out = jax.jit(self.model.apply)({"params": self.params}, feat)
        if cfg.mode == "discrete":
            mat_id = jnp.asarray(batch[1])
            acc = compute_accuracy(
                jnp.moveaxis(out, -1, 1), mat_id, mask=None,
                ignore_index=cfg.background_id,
            )
            return {"accuracy": float(acc)}
        _, aux = continuous_loss(out, jnp.asarray(batch[1]), jnp.asarray(batch[2]))
        return {k: float(v) for k, v in aux.items()}

    # -- orbax checkpoints ----------------------------------------------------
    def save_checkpoint(self, ckpt_dir: str | Path, epoch: int):
        import orbax.checkpoint as ocp  # noqa: PLC0415

        path = Path(ckpt_dir).resolve() / f"epoch_{epoch}"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {"params": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "epoch": epoch},
                force=True,
            )
        return str(path)

    def load_checkpoint(self, path: str | Path):
        import orbax.checkpoint as ocp  # noqa: PLC0415

        with ocp.StandardCheckpointer() as ckptr:
            target = {
                "params": jax.device_get(self.params),
                "opt_state": jax.device_get(self.opt_state),
                "epoch": 0,
            }
            restored = ckptr.restore(Path(path).resolve(), target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.epoch = int(restored["epoch"])


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """Auto-latest epoch_k discovery (training_utils.py:137-188)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    candidates = []
    for p in ckpt_dir.glob("epoch_*"):
        try:
            candidates.append((int(p.name.split("_")[1]), p))
        except (IndexError, ValueError):
            continue
    return max(candidates)[1] if candidates else None


def train_loop(
    cfg: TrainConfig,
    dataset: MaterialVoxelDataset,
    ckpt_dir: str | Path,
    log_every: int = 10,
    max_steps: int | None = None,
):
    """Full training loop mirroring the reference's epoch structure."""
    rng = np.random.default_rng(cfg.seed)
    train_idx, test_idx = train_test_split(len(dataset), cfg.train_size, seed=42)
    save_splits(Path(ckpt_dir) / "train_test_splits.json", dataset, train_idx, test_idx)

    steps_per_epoch = max(len(train_idx) // cfg.batch_size, 1)
    trainer = Trainer(cfg)
    trainer.setup(steps_per_epoch)

    history = []
    step_count = 0
    for epoch in range(cfg.epochs):
        order = rng.permutation(train_idx)
        t0 = time.time()
        losses = []
        for feat, cont, mat_id, mask, infos, _ in dataset.batches(
            cfg.batch_size, order, drop_remainder=True
        ):
            batch = (
                (feat, mat_id, mask) if cfg.mode == "discrete" else (feat, cont, mask)
            )
            loss, aux = trainer.train_step(batch)
            losses.append(float(loss))
            step_count += 1
            if max_steps and step_count >= max_steps:
                break
        history.append({"epoch": epoch, "loss": float(np.mean(losses)) if losses else None,
                        "time_s": time.time() - t0})
        if epoch % log_every == 0:
            logging.info("epoch %d loss %.5f (%.1fs)", epoch, history[-1]["loss"] or -1,
                         history[-1]["time_s"])
        if (epoch + 1) % cfg.save_interval == 0 or epoch == cfg.epochs - 1:
            trainer.save_checkpoint(ckpt_dir, epoch)
        if max_steps and step_count >= max_steps:
            break
    Path(ckpt_dir, "history.json").write_text(json.dumps(history))
    return trainer, history
