"""Epoch-driven trainers.

Mirrors the reference trainer surface (trainers/defectgan_trainer.py:19-188,
trainers/base_trainer.py:12-131, trainers/mae_trainer.py, wgan_trainer.py):
epoch loop, per-iteration alternating updates, running-mean postfix logging,
'latest' checkpoints + iter.txt every save_latest_freq, epoch checkpoints +
validation metrics, TensorBoard scalars and image grids.

TPU-first: the inner loop advances ``num_critics`` iterations per device
launch via DefectGanSteps.super_step; host work (logging, checkpointing) never
blocks the device queue except at the async fetch of metrics.
"""
from __future__ import annotations

import math
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from de_i2i_gan_tpu.config import DefectGanConfig, MAEConfig, TrainConfig
from de_i2i_gan_tpu.data.pipeline import DualStreamLoader
from de_i2i_gan_tpu.nn.normalization import sean_update_stats
from de_i2i_gan_tpu.train.checkpoint import (
    latest_exists, load_checkpoint, read_iter_record, save_checkpoint)
from de_i2i_gan_tpu.train.state import GANTrainState, NetState
from de_i2i_gan_tpu.train.steps import DefectGanSteps


class TBWriter:
    """Thin TensorBoard wrapper (SummaryWriter if available, else no-op)."""

    def __init__(self, log_dir: Optional[Path]):
        self._w = None
        if log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._w = SummaryWriter(str(log_dir))
            except Exception:
                pass

    def scalar(self, tag, value, step):
        if self._w:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, tag, d, step):
        if self._w:
            self._w.add_scalars(tag, {k: float(v) for k, v in d.items()}, step)

    def image(self, tag, img_hwc, step):
        if self._w:
            self._w.add_image(tag, np.asarray(img_hwc), step,
                              dataformats="HWC")

    def close(self):
        if self._w:
            self._w.close()


class DefectGanTrainer:
    def __init__(self, cfg: DefectGanConfig, tcfg: TrainConfig, *,
                 name: str = "exp", ckpt_dir: Path = Path("./ckpt"),
                 log_dir: Optional[Path] = Path("./logs"),
                 iters_per_epoch: int = 1000, num_epochs: int = -1,
                 continue_training: bool = False,
                 load_model_name: Optional[str] = None,
                 which_epoch: str = "latest",
                 save_latest_freq: int = 1000, save_ckpt_freq: int = 4,
                 save_img_freq: int = 4, seed: int = 123, embed_bank=None,
                 mesh=None):
        self.cfg, self.tcfg = cfg, tcfg
        # multi-chip data parallelism: batch sharded over mesh('data'),
        # params/opt/EMA replicated, gradient all-reduce by GSPMD over ICI
        # (the reference's only analog is single-process nn.DataParallel,
        # stargan-v2/core/model.py:694-704)
        self.mesh = mesh
        # SEAN style-embedding bank (--embed_path, defectgan_model.py:43-45)
        self.embed_bank = embed_bank
        # divergence detection + rollback (SURVEY.md §5.3)
        from de_i2i_gan_tpu.utils.guards import NaNGuard
        self._guard = NaNGuard()
        self._pending = []  # device-side metric dicts awaiting host fetch
        self.name = name
        self.ckpt_dir = Path(ckpt_dir)
        self.log_dir = Path(log_dir) / name if log_dir else None
        self.save_latest_freq = save_latest_freq
        self.save_ckpt_freq = save_ckpt_freq
        self.save_img_freq = save_img_freq

        # epoch/iteration reconciliation (base_trainer.py:45-47)
        if num_epochs == -1:
            num_epochs = math.ceil(tcfg.num_iters / max(iters_per_epoch, 1))
        self.num_epochs = num_epochs
        self.iters_per_epoch = iters_per_epoch

        self.steps = DefectGanSteps(cfg, tcfg, iters_per_epoch, num_epochs)
        self.state = self.steps.init_state(jax.random.PRNGKey(seed))
        self._batch_sharding = None
        if mesh is not None:
            from de_i2i_gan_tpu.parallel.mesh import (
                batch_sharding, make_parallel_step)
            n_local = int(mesh.devices.size) // jax.process_count()
            assert tcfg.batch_size % n_local == 0, (
                f"per-host batch_size {tcfg.batch_size} not divisible by "
                f"{n_local} local mesh devices")
            # super-batches are (num_critics, B, ...): shard axis 1
            self._batch_sharding = batch_sharding(mesh, batch_axis=1)
            self._step = make_parallel_step(self.steps.super_step, mesh,
                                            batch_axis=1)
        else:
            self._step = self.steps.jit_super_step
        self.first_epoch, self.iters = 1, 0
        if continue_training and latest_exists(self.ckpt_dir, name):
            self.state = load_checkpoint(self.ckpt_dir, name, "latest",
                                         self.state)
            self.first_epoch, self.iters = read_iter_record(self.ckpt_dir, name)
        elif load_model_name is not None:
            # cross-variant warm start (e.g. from MAE pretraining)
            self.state = load_checkpoint(self.ckpt_dir, load_model_name,
                                         which_epoch, self.state, strict=False)
        self._rng = jax.random.PRNGKey(seed + 1)

    def _drain_metrics(self, sums, counts):
        if not self._pending:
            return
        from de_i2i_gan_tpu.utils.guards import metrics_finite
        fetched = jax.device_get(self._pending)
        self._pending = []
        # detection is deferred by up to the drain window, so only snapshot
        # when the whole window was clean; otherwise roll the live state back
        # to the last good snapshot
        bad = next((m for m in fetched if not metrics_finite(m)), None)
        if bad is None:
            for metrics in fetched:
                for k, v in metrics.items():
                    sums[k] += float(v)
                    counts[k] += 1
            self._guard.update(self.state, fetched[-1])
        else:
            self.state, _ = self._guard.update(self.state, bad)

    # ------------------------------------------------------------------ train
    def train(self, train_loader: DualStreamLoader, val_fn=None,
              progress: bool = True):
        writer = TBWriter(self.log_dir)
        try:
            from tqdm import tqdm
        except ImportError:
            tqdm = None
        nc = self.tcfg.num_critics
        from de_i2i_gan_tpu.data.pipeline import device_prefetch
        if self.mesh is not None:
            # replicate params/opt/EMA over the mesh (after any resume load)
            from de_i2i_gan_tpu.parallel.mesh import put_replicated
            self.state = put_replicated(self.state, self.mesh)
        for epoch in range(self.first_epoch, self.num_epochs + 1):
            sums, counts = defaultdict(float), defaultdict(int)
            it = device_prefetch(train_loader,
                                 sharding=self._batch_sharding)
            bar = tqdm(it, total=len(train_loader), colour="MAGENTA",
                       desc=f"Epoch [{epoch}/{self.num_epochs}]") \
                if (progress and tqdm) else it
            for super_batch in bar:
                self._rng, key, k_emb = jax.random.split(self._rng, 3)
                if self.embed_bank is not None and \
                        self.cfg.style_norm_block_type == "sean":
                    from de_i2i_gan_tpu.data.embeddings import attach_embeddings
                    super_batch = attach_embeddings(
                        super_batch, self.embed_bank, self.cfg.num_embeds,
                        k_emb)
                new_state, metrics = self._step(
                    self.state, super_batch, key)
                self._pending.append(metrics)
                self.state = new_state
                self.iters += nc
                # metric fetches are host round trips (32ms each over the
                # axon tunnel); drain asynchronously every few super-steps so
                # the device queue stays full
                if len(self._pending) >= 4:
                    self._drain_metrics(sums, counts)
                if progress and tqdm and counts:
                    bar.set_postfix({k: f"{sums[k] / counts[k]:.4f}"
                                     for k in ("gan_D", "gan_G", "rec")
                                     if counts.get(k)})
                if self.iters % self.save_latest_freq < nc:
                    save_checkpoint(self.ckpt_dir, self.name, "latest",
                                    self.state, epoch=epoch, iters=self.iters)
            self._drain_metrics(sums, counts)
            # per-epoch bookkeeping
            means = {k: sums[k] / max(counts[k], 1) for k in sums}
            writer.scalars("Losses/gan",
                           {k: v for k, v in means.items() if "gan" in k},
                           epoch)
            writer.scalars("Losses/aux",
                           {k: v for k, v in means.items() if "gan" not in k},
                           epoch)
            if epoch % self.save_ckpt_freq == 0:
                save_checkpoint(self.ckpt_dir, self.name, epoch, self.state,
                                epoch=epoch, iters=self.iters)
                if val_fn is not None:
                    for k, v in (val_fn(self.state, epoch) or {}).items():
                        writer.scalar(f"Metrics/{k}", v, epoch)
            self._update_per_epoch(epoch)
        # final 'latest' so short runs (< save_latest_freq iters) still leave
        # a loadable checkpoint for the test CLIs
        save_checkpoint(self.ckpt_dir, self.name, "latest", self.state,
                        epoch=self.num_epochs, iters=self.iters)
        writer.close()
        return self.state

    def _update_per_epoch(self, epoch: int):
        """SEAN per-epoch running-stat finalization
        (generator.py:277-284,308-311). LR schedules are already pure
        functions of the step count."""
        cfg = self.cfg
        if cfg.style_norm_block_type == "sean" and cfg.use_running_stats:
            g_state = dict(self.state.G.state)
            if "sean_stats" in g_state:
                g_state["sean_stats"] = sean_update_stats(
                    jax.tree_util.tree_map(np.asarray,
                                           g_state["sean_stats"]))
                self.state = self.state.replace(
                    G=self.state.G.replace(state=g_state))

    # -------------------------------------------------------------- sampling
    def generate_grid(self, bg_images: jax.Array, labels: jax.Array,
                      img_only: bool = False):
        return _generate_grid_impl(self, bg_images, labels, img_only)


class MAETrainer:
    """MAE-GAN pretraining loop (trainers/mae_trainer.py:13-158): fusion-data
    epoch loop, per-iter D step + G step every num_critics, val losses, repair
    grids, mask-token image."""

    def __init__(self, cfg, mcfg, tcfg, *, name="mae_exp",
                 ckpt_dir=Path("./ckpt"), log_dir=Path("./logs"),
                 iters_per_epoch=1000, num_epochs=200,
                 continue_training=False, save_latest_freq=300,
                 save_ckpt_freq=4, save_img_freq=1, seed=123, mesh=None):
        from de_i2i_gan_tpu.train.mae_steps import MAESteps
        self.cfg, self.mcfg, self.tcfg = cfg, mcfg, tcfg
        self.name = name
        self.mesh = mesh
        self.ckpt_dir = Path(ckpt_dir)
        self.log_dir = Path(log_dir) / name if log_dir else None
        self.save_latest_freq = save_latest_freq
        self.save_ckpt_freq = save_ckpt_freq
        self.save_img_freq = save_img_freq
        if num_epochs == -1:
            num_epochs = math.ceil(tcfg.num_iters / max(iters_per_epoch, 1))
        self.num_epochs = num_epochs
        self.steps = MAESteps(cfg, mcfg, tcfg, iters_per_epoch, num_epochs)
        self.state = self.steps.init_state(jax.random.PRNGKey(seed))
        self._batch_sharding = None
        if mesh is not None:
            # same mesh contract as DefectGanTrainer: (num_critics, B, ...)
            # super-batches sharded on axis 1, state replicated, GSPMD
            # gradient all-reduce over ICI
            from de_i2i_gan_tpu.parallel.mesh import (
                batch_sharding, make_parallel_step)
            n_local = int(mesh.devices.size) // jax.process_count()
            assert tcfg.batch_size % n_local == 0, (
                f"per-host batch_size {tcfg.batch_size} not divisible by "
                f"{n_local} local mesh devices")
            self._batch_sharding = batch_sharding(mesh, batch_axis=1)
            self._step = make_parallel_step(self.steps.super_step, mesh,
                                            batch_axis=1)
        else:
            self._step = self.steps.jit_super_step
        self.first_epoch, self.iters = 1, 0
        if continue_training and latest_exists(self.ckpt_dir, name):
            self.state = load_checkpoint(self.ckpt_dir, name, "latest",
                                         self.state)
            self.first_epoch, self.iters = read_iter_record(self.ckpt_dir,
                                                            name)
        self._rng = jax.random.PRNGKey(seed + 1)

    def train(self, fusion_loader, val_loader=None, progress: bool = True):
        writer = TBWriter(self.log_dir)
        try:
            from tqdm import tqdm
        except ImportError:
            tqdm = None
        nc = self.tcfg.num_critics
        if self.mesh is not None:
            from de_i2i_gan_tpu.parallel.mesh import put_replicated
            self.state = put_replicated(self.state, self.mesh)
        for epoch in range(self.first_epoch, self.num_epochs + 1):
            sums, counts = defaultdict(float), defaultdict(int)
            from de_i2i_gan_tpu.data.pipeline import device_prefetch
            it = device_prefetch(fusion_loader,
                                 sharding=self._batch_sharding)
            bar = tqdm(it, total=len(fusion_loader), colour="MAGENTA",
                       desc=f"MAE [{epoch}/{self.num_epochs}]") \
                if (progress and tqdm) else it
            for super_batch in bar:
                self._rng, key = jax.random.split(self._rng)
                self.state, metrics = self._step(
                    self.state, super_batch, key)
                self.iters += nc
                for k, v in metrics.items():
                    sums[k] += float(v)
                    counts[k] += 1
                if progress and tqdm:
                    bar.set_postfix({k: f"{sums[k] / counts[k]:.4f}"
                                     for k in ("rec", "gan_D", "gan_G")
                                     if counts.get(k)})
                if self.iters % self.save_latest_freq < nc:
                    save_checkpoint(self.ckpt_dir, self.name, "latest",
                                    self.state, epoch=epoch, iters=self.iters)
            means = {k: sums[k] / max(counts[k], 1) for k in sums}
            writer.scalars("Losses/mae", means, epoch)
            if val_loader is not None:
                vals = defaultdict(list)
                for batch in val_loader:
                    self._rng, key = jax.random.split(self._rng)
                    ev = self.steps.jit_eval_losses(self.state, batch, key)
                    for k, v in ev.items():
                        vals[k].append(float(v))
                writer.scalars("Losses/mae_val",
                               {k: float(np.mean(v)) for k, v in vals.items()},
                               epoch)
            if epoch % self.save_ckpt_freq == 0:
                save_checkpoint(self.ckpt_dir, self.name, epoch, self.state,
                                epoch=epoch, iters=self.iters)
        # final 'latest' so short runs (< save_latest_freq iters) still leave
        # a loadable warm-start checkpoint (--load_model_name)
        save_checkpoint(self.ckpt_dir, self.name, "latest", self.state,
                        epoch=self.num_epochs, iters=self.iters)
        writer.close()
        return self.state


class Pix2PixTrainer:
    """Paired-i2i (pix2pix/pix2pixHD-style) loop over Pix2PixSteps: scan-fused
    launches, async metric drain + NaN guard, latest/epoch checkpoints,
    TensorBoard input|fake|target panels."""

    def __init__(self, cfg: DefectGanConfig, tcfg: TrainConfig, *,
                 name: str = "pix2pix_exp", ckpt_dir: Path = Path("./ckpt"),
                 log_dir: Optional[Path] = Path("./logs"),
                 num_d_scales: int = 2, n_layers_d: int = 3,
                 gan_kind: str = "lsgan", lambda_l1: float = 100.0,
                 lambda_fm: float = 10.0, iters_per_epoch: int = 1000,
                 num_epochs: int = 200, continue_training: bool = False,
                 save_latest_freq: int = 1000, save_ckpt_freq: int = 4,
                 save_img_freq: int = 4, seed: int = 123,
                 fused_prop: bool = False, mesh=None):
        from de_i2i_gan_tpu.train.pix2pix_steps import Pix2PixSteps
        from de_i2i_gan_tpu.utils.guards import NaNGuard
        self.cfg, self.tcfg = cfg, tcfg
        # multi-chip DP (see DefectGanTrainer.mesh)
        self.mesh = mesh
        if mesh is not None:
            n_local = int(mesh.devices.size) // jax.process_count()
            assert tcfg.batch_size % n_local == 0, (
                f"per-host batch_size {tcfg.batch_size} not divisible by "
                f"{n_local} local mesh devices")
        self.name = name
        self.ckpt_dir = Path(ckpt_dir)
        self.log_dir = Path(log_dir) / name if log_dir else None
        self.save_latest_freq = save_latest_freq
        self.save_ckpt_freq = save_ckpt_freq
        self.save_img_freq = save_img_freq
        if num_epochs == -1:
            num_epochs = math.ceil(tcfg.num_iters / max(iters_per_epoch, 1))
        self.num_epochs = num_epochs
        self.steps = Pix2PixSteps(cfg, tcfg, num_d_scales=num_d_scales,
                                  gan_kind=gan_kind, lambda_l1=lambda_l1,
                                  lambda_fm=lambda_fm,
                                  iters_per_epoch=iters_per_epoch,
                                  num_epochs=num_epochs,
                                  n_layers_d=n_layers_d,
                                  fused_prop=fused_prop)
        self.state = self.steps.init_state(jax.random.PRNGKey(seed))
        self._guard = NaNGuard()
        self._pending = []
        self.first_epoch, self.iters = 1, 0
        if continue_training and latest_exists(self.ckpt_dir, name):
            self.state = load_checkpoint(self.ckpt_dir, name, "latest",
                                         self.state)
            self.first_epoch, self.iters = read_iter_record(self.ckpt_dir,
                                                            name)
        self._rng = jax.random.PRNGKey(seed + 1)

    def _drain_metrics(self, sums, counts):
        if not self._pending:
            return
        from de_i2i_gan_tpu.utils.guards import metrics_finite
        fetched = jax.device_get(self._pending)
        self._pending = []
        bad = next((m for m in fetched if not metrics_finite(m)), None)
        if bad is None:
            for metrics in fetched:
                for k, v in metrics.items():
                    sums[k] += float(v)
                    counts[k] += 1
            self._guard.update(self.state, fetched[-1])
        else:
            self.state, _ = self._guard.update(self.state, bad)

    def train(self, loader, val_loader=None, progress: bool = True):
        writer = TBWriter(self.log_dir)
        try:
            from tqdm import tqdm
        except ImportError:
            tqdm = None
        ipl = getattr(loader, "iters_per_launch", 1)
        from de_i2i_gan_tpu.data.pipeline import device_prefetch
        batch_sh = None
        if self.mesh is not None:
            from de_i2i_gan_tpu.parallel.mesh import (
                batch_sharding, make_parallel_step, put_replicated)
            ba = 1 if ipl > 1 else 0
            batch_sh = batch_sharding(self.mesh, ba)
            step_fn = make_parallel_step(
                self.steps.super_step if ipl > 1 else self.steps.train_step,
                self.mesh, batch_axis=ba)
            self.state = put_replicated(self.state, self.mesh)
        else:
            step_fn = self.steps.jit_super_step if ipl > 1 \
                else self.steps.jit_train_step
        vis_batch = None
        for epoch in range(self.first_epoch, self.num_epochs + 1):
            sums, counts = defaultdict(float), defaultdict(int)
            it = device_prefetch(loader, sharding=batch_sh)
            bar = tqdm(it, total=len(loader), colour="MAGENTA",
                       desc=f"pix2pix [{epoch}/{self.num_epochs}]") \
                if (progress and tqdm) else it
            for batch in bar:
                if vis_batch is None:
                    vis_batch = jax.tree_util.tree_map(
                        lambda x: _host_images_to_float(
                            np.asarray(x[0] if ipl > 1 else x)[:4]),
                        batch)
                    if "pair" in vis_batch:  # native loader's stacked form
                        p = vis_batch.pop("pair")
                        vis_batch["input"], vis_batch["target"] = \
                            p[..., :3], p[..., 3:]
                self._rng, key = jax.random.split(self._rng)
                new_state, metrics = step_fn(self.state, batch, key)
                self._pending.append(metrics)
                self.state = new_state
                self.iters += ipl
                if len(self._pending) >= 4:
                    self._drain_metrics(sums, counts)
                if progress and tqdm and counts:
                    bar.set_postfix({k: f"{sums[k] / counts[k]:.4f}"
                                     for k in ("d_loss", "adv", "l1")
                                     if counts.get(k)})
                if self.iters % self.save_latest_freq < ipl:
                    save_checkpoint(self.ckpt_dir, self.name, "latest",
                                    self.state, epoch=epoch, iters=self.iters)
            self._drain_metrics(sums, counts)
            means = {k: sums[k] / max(counts[k], 1) for k in sums}
            writer.scalars("Losses/pix2pix", means, epoch)
            if epoch % self.save_img_freq == 0 and vis_batch is not None:
                fake = np.asarray(self.steps.jit_generate(
                    self.state, jnp.asarray(vis_batch["input"])))
                panel = np.concatenate(
                    [np.concatenate(
                        [vis_batch["input"][i], fake[i],
                         vis_batch["target"][i]], axis=1)
                     for i in range(fake.shape[0])], axis=0)
                writer.image("Images/input_fake_target", (panel + 1) / 2,
                             epoch)
            save_checkpoint(self.ckpt_dir, self.name, "latest", self.state,
                            epoch=epoch, iters=self.iters)
            if epoch % self.save_ckpt_freq == 0:
                save_checkpoint(self.ckpt_dir, self.name, epoch, self.state,
                                epoch=epoch, iters=self.iters)
                if val_loader is not None:
                    vals = defaultdict(list)
                    for vb in val_loader:
                        fake = self.steps.jit_generate(
                            self.state, jnp.asarray(vb["input"]))
                        vals["val_l1"].append(float(jnp.mean(jnp.abs(
                            fake - jnp.asarray(vb["target"])))))
                    for k, v in vals.items():
                        writer.scalar(f"Metrics/{k}", float(np.mean(v)),
                                      epoch)
        writer.close()
        return self.state


class WGanTrainer:
    """WGAN loop (trainers/wgan_trainer.py:18-138): weight clipping inside the
    step, fixed-noise sample grids per epoch."""

    def __init__(self, cfg, tcfg, *, name="wgan_exp", ckpt_dir=Path("./ckpt"),
                 log_dir=Path("./logs"), iters_per_epoch=1000,
                 num_epochs=120, continue_training=False,
                 save_latest_freq=1000, save_ckpt_freq=4, seed=123,
                 mesh=None):
        from de_i2i_gan_tpu.train.wgan_steps import WGanSteps
        self.cfg, self.tcfg = cfg, tcfg
        self.name = name
        self.mesh = mesh
        self.ckpt_dir = Path(ckpt_dir)
        self.log_dir = Path(log_dir) / name if log_dir else None
        self.save_latest_freq = save_latest_freq
        self.save_ckpt_freq = save_ckpt_freq
        self.num_epochs = num_epochs
        self.steps = WGanSteps(cfg, tcfg, iters_per_epoch, num_epochs)
        self.state = self.steps.init_state(jax.random.PRNGKey(seed))
        self._batch_sharding = None
        if mesh is not None:
            # (num_critics, B, ...) super-batches sharded on axis 1, state
            # replicated (same contract as DefectGanTrainer)
            from de_i2i_gan_tpu.parallel.mesh import (
                batch_sharding, make_parallel_step)
            n_local = int(mesh.devices.size) // jax.process_count()
            assert tcfg.batch_size % n_local == 0, (
                f"per-host batch_size {tcfg.batch_size} not divisible by "
                f"{n_local} local mesh devices")
            self._batch_sharding = batch_sharding(mesh, batch_axis=1)
            self._step = make_parallel_step(self.steps.super_step, mesh,
                                            batch_axis=1)
        else:
            self._step = self.steps.jit_super_step
        self.first_epoch, self.iters = 1, 0
        if continue_training and latest_exists(self.ckpt_dir, name):
            self.state = load_checkpoint(self.ckpt_dir, name, "latest",
                                         self.state)
            self.first_epoch, self.iters = read_iter_record(self.ckpt_dir,
                                                            name)
        self._rng = jax.random.PRNGKey(seed + 1)
        self.fixed_noise = jax.random.normal(
            jax.random.PRNGKey(seed + 2), (16, cfg.noise_dim))

    def train(self, loader, progress: bool = True):
        writer = TBWriter(self.log_dir)
        nc = self.cfg.num_critics
        if self.mesh is not None:
            from de_i2i_gan_tpu.parallel.mesh import put_replicated
            self.state = put_replicated(self.state, self.mesh)
        for epoch in range(self.first_epoch, self.num_epochs + 1):
            sums, counts = defaultdict(float), defaultdict(int)
            from de_i2i_gan_tpu.data.pipeline import device_prefetch
            for super_batch in device_prefetch(
                    loader, sharding=self._batch_sharding):
                self._rng, key = jax.random.split(self._rng)
                self.state, metrics = self._step(
                    self.state, super_batch, key)
                self.iters += nc
                for k, v in metrics.items():
                    sums[k] += float(v)
                    counts[k] += 1
                if self.iters % self.save_latest_freq < nc:
                    save_checkpoint(self.ckpt_dir, self.name, "latest",
                                    self.state, epoch=epoch, iters=self.iters)
            writer.scalars("Losses/wgan",
                           {k: sums[k] / max(counts[k], 1) for k in sums},
                           epoch)
            sample = self.steps.jit_sample(self.state, self.fixed_noise)
            grid = np.asarray(sample).reshape(4, 4, *sample.shape[1:])
            grid = grid.transpose(0, 2, 1, 3, 4).reshape(
                4 * sample.shape[1], 4 * sample.shape[2], 3)
            writer.image("Images/fixed_noise", (grid + 1) / 2, epoch)
            if epoch % self.save_ckpt_freq == 0:
                save_checkpoint(self.ckpt_dir, self.name, epoch, self.state,
                                epoch=epoch, iters=self.iters)
        save_checkpoint(self.ckpt_dir, self.name, "latest", self.state,
                        epoch=self.num_epochs, iters=self.iters)
        writer.close()
        return self.state


def _host_images_to_float(x: np.ndarray) -> np.ndarray:
    """u8 loader batches -> [-1,1] f32 on host (visualization panels)."""
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 127.5 - 1.0
    return x


def _generate_grid_impl(trainer, bg_images, labels, img_only):
    """Per-background translation panels (defectgan_model.py:316-344):
    returns (n_bg, n_labels, H, W, 3) generated images plus probability maps
    for heat-map rendering on the host."""
    n_bg = bg_images.shape[0]
    n_lbl = labels.shape[0]
    rep_imgs = jnp.repeat(bg_images, n_lbl, axis=0)
    rep_lbls = jnp.tile(labels, (n_bg, 1))
    feat = None
    if trainer.cfg.style_norm_block_type == "sean":
        feat = jnp.zeros((rep_imgs.shape[0], trainer.cfg.num_embeds,
                          trainer.cfg.embed_nc), jnp.float32)
    out, prob = trainer.steps.jit_generate(trainer.state, rep_imgs, rep_lbls,
                                           feat)
    out = out.reshape(n_bg, n_lbl, *out.shape[1:])
    prob = prob.reshape(n_bg, n_lbl, *prob.shape[1:])
    return out, prob
