"""Training loop scaffolding (reference src/trainer/base_trainer.py).

The reference's per-iteration structure (loss step / log step / eval step /
save step / time step, NaN-skip guard, infinite-cycling loader) is preserved;
the compute is reorganized TPU-first: the whole optimization step (forward,
losses, grads, optimizer update, aux update — and for GAN stages the extra
forwards and the D step) is ONE jitted XLA program with donated state, and
batches stream in from a host prefetch thread.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..data import DataLoader, build_dataset, cycle
from ..models import build_comp_model
from ..utils.logger import (AvgMeter, CSVLogger, bolded_log, get_root_logger,
                            log_dict_items)
from ..utils.path import PathHandler
from ..utils.saver import Saver, load_pytree
from ..utils.timer import Timer


@struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    aux_opt_state: Any
    d_params: Any = None
    d_opt_state: Any = None
    d_stats: Any = None


class BaseTrainer:
    def __init__(self, opt):
        self.opt = opt
        self.logger = get_root_logger(
            log_file=opt.path.log_file_path if opt.get("path") else None)
        self.rng = jax.random.PRNGKey(opt.get("seed", 0))
        self._np_rng = np.random.default_rng(opt.get("seed", None))

        bolded_log("Model", new_line=True)
        self.set_models()
        bolded_log("Optimizers & Schedulers", new_line=True)
        self.set_optimizer_scheduler()
        bolded_log("Loss functions", new_line=True)
        self.set_losses()
        bolded_log("Dataloader", new_line=True)
        self.set_dataloader()
        self.set_csv_loggers()

        self.use_wandb = bool(opt.get("use_wandb", False))
        if self.use_wandb:
            from ..utils import wandb_compat

            self._wandb = wandb_compat
            wandb_compat.init(
                project=opt.get("project_name", "crdr_tpu"), name=opt.exp,
                config=opt.to_dict() if hasattr(opt, "to_dict") else None,
                resume=opt.start_iter > 0,
                wandb_dir=opt.get("wandb_root", "./"),
                log_dir=opt.path.job_dir if opt.get("path") else ".")
        else:
            self._wandb = None

        self.loss_recorder = AvgMeter()
        self.time_recorder = Timer(start_iter=opt.start_iter,
                                   end_iter=opt.total_iter)
        self.path_handler = PathHandler(opt.ckpt_root, opt.exp)
        self.model_saver = Saver(opt.ckpt_root, opt.exp, opt.save_step,
                                 opt.get("keep_step", []))
        self._setup_mesh()
        self.state = self.init_state()

        if opt.start_iter > 0:
            self.load_checkpoint(opt.exp, opt.start_iter)
        if opt.get("load_checkpoint", None):
            lc = dict(opt.load_checkpoint)
            self.load_checkpoint(lc.pop("exp"), lc.pop("iter"), **lc)
        if self.mesh is not None:
            # params + optimizer state live replicated on every mesh device;
            # XLA inserts the gradient all-reduce from the shardings alone.
            self.state = self._replicate(self.state)
        if opt.get("dry_run"):
            self.print_models()
            raise SystemExit(0)

    # ------------------ setup hooks ------------------

    def set_models(self) -> None:
        self.comp_model = build_comp_model(self.opt)
        self.comp_model.init_params(
            input_size=self.opt.dataset.train_dataset.get("image_size", 256))
        if self.opt.get("pretrained_weight_path", None):
            self.comp_model.load_learned_weight(self.opt.pretrained_weight_path)

    def set_optimizer_scheduler(self) -> None:
        raise NotImplementedError

    def set_losses(self) -> None:
        raise NotImplementedError

    def set_dataloader(self) -> None:
        ds_opt = self.opt.dataset
        train_dataset = build_dataset(ds_opt.train_dataset, is_train=True)
        log_dict_items({"batch_size": ds_opt.batch_size,
                        "train_images": len(train_dataset)}, indent=True)
        self.train_loader = DataLoader(
            train_dataset, batch_size=ds_opt.batch_size, shuffle=True,
            drop_last=True, seed=self.opt.get("seed", None),
            num_workers=self.opt.get("num_workers", 8),
            prefetch=self.opt.get("prefetch_batches", 4))
        eval_dataset = build_dataset(ds_opt.eval_dataset, is_train=False)
        self.eval_loader = DataLoader(eval_dataset, batch_size=1)

    def set_csv_loggers(self) -> None:
        resume = self.opt.start_iter > 0
        self.train_logger = CSVLogger(self.opt.path.log_loss_path, resume)
        self.eval_logger = CSVLogger(self.opt.path.log_eval_path, resume)

    def init_state(self) -> TrainState:
        raise NotImplementedError

    def print_models(self) -> None:
        bolded_log("Print Models", level="DEBUG", new_line=True)
        self.logger.info(str(self.comp_model.net))
        shapes = jax.tree.map(lambda a: a.shape, self.comp_model.params)
        n_params = sum(np.prod(a.shape)
                       for a in jax.tree.leaves(self.comp_model.params))
        self.logger.info(f"total params: {n_params / 1e6:.2f}M")
        self.logger.debug(str(shapes))

    # ------------------ main loop ------------------

    def train_loop(self) -> None:
        bolded_log("train_loop start", new_line=True)
        self.opt.path and self._dump_config()
        self.time_recorder.start()
        # lazy logging: steps return device scalars; one batched host pull
        # per log boundary instead of a sync every iteration (keeps the
        # step pipeline async and shrinks the relay-wedge surface 100x)
        lazy = (hasattr(self, "optimize_parameters_device")
                and bool(self.opt.get("lazy_log", True)))
        self._pending_logs = []
        for itr, data in cycle(self.train_loader, self.opt.start_iter,
                               self.opt.total_iter):
            if lazy:
                self._pending_logs.append(
                    (itr, self.optimize_parameters_device(itr, data)))
            else:
                loss_dict = self.optimize_parameters(itr, data)
                if loss_dict is not None:
                    self.loss_recorder.update(loss_dict)
            if itr % self.opt.log_step == 0:
                self._flush_device_logs()
                self.log_train_loss(itr)
            if itr % self.opt.eval_step == 0:
                self._flush_device_logs()
                self.validation(itr)
            if itr % self.opt.save_step == 0:
                self._flush_device_logs()
                self.save(itr)
            if itr % self.opt.get("time_step", 1000) == 0:
                self.log_time(itr)
        self._flush_device_logs()

    def _flush_device_logs(self) -> None:
        """Batched host pull of the accumulated per-step device logs; the
        NaN-skip warning moves here (the jitted step already guarded the
        state update — the Python side only reports)."""
        pending = getattr(self, "_pending_logs", None)
        if not pending:
            return
        self._pending_logs = []
        for itr, row in zip([p[0] for p in pending],
                            jax.device_get([p[1] for p in pending])):
            row = {k: float(v) for k, v in row.items()}
            if row.pop("skipped", 0.0) > 0:
                self.logger.warning(f"iter{itr}: skipped (loss anomaly)")
                continue
            self.loss_recorder.update(row)

    def _dump_config(self) -> None:
        try:
            os.makedirs(self.opt.path.job_dir, exist_ok=True)
            self.opt.dump(self.opt.path.config_dump_path)
        except Exception:
            pass

    def optimize_parameters(self, itr: int, data: Dict) -> Optional[Dict]:
        raise NotImplementedError

    # ------------------ data parallelism ------------------
    # The reference trains on one device only (README.md:62-63); here
    # ``n_devices: N`` (config key or --n_devices) runs the SAME jitted step
    # over a Mesh("data"): batch sharded on the leading dim, params/opt state
    # replicated, gradient all-reduce inserted by XLA over ICI.

    def _setup_mesh(self) -> None:
        n = int(self.opt.get("n_devices", 0) or 0)
        if n <= 1:
            self.mesh = None
            self.dp_sharding = None
            self.rep_sharding = None
            return
        from ..parallel.mesh import batch_sharding, make_mesh, replicated

        bs = self.opt.dataset.batch_size
        assert bs % n == 0, \
            f"batch_size {bs} must be divisible by n_devices {n}"
        self.mesh = make_mesh(n)
        self.dp_sharding = batch_sharding(self.mesh)
        self.rep_sharding = replicated(self.mesh)
        self.logger.info(
            f"data-parallel mesh: {n} devices, {bs // n} images/device")

    def _replicate(self, tree):
        from ..parallel.mesh import replicate_tree

        return replicate_tree(tree, self.mesh)

    def _put_batch(self, batch):
        batch = jnp.asarray(batch)
        if self.mesh is None:
            return batch
        return jax.device_put(batch, self.dp_sharding)

    def _jit_step(self, step_fn):
        """jit the fused optimization step.  Under a mesh the signature is
        (state, batch, rate_ind, beta, rng, mults, loss_consts): state and
        scalars replicated, batch sharded on the ``data`` axis."""
        if self.mesh is None:
            return jax.jit(step_fn, donate_argnums=0)
        rep, dp = self.rep_sharding, self.dp_sharding
        return jax.jit(step_fn, donate_argnums=0,
                       in_shardings=(rep, dp, rep, rep, rep, rep, rep),
                       out_shardings=(rep, rep))

    def next_rng(self):
        self.rng, rng = jax.random.split(self.rng)
        return rng

    # ------------------ logging / eval / save ------------------

    def validation(self, current_iter: int) -> None:
        self.comp_model.params = self.state.params
        eval_df = self.comp_model.validation(self.eval_loader,
                                             max_sample_size=100)
        eval_dict = {k: float(v) for k, v in
                     eval_df.drop(columns=["idx"]).mean().items()}
        log_str = f"validation iter{current_iter}: " + " ".join(
            f"{k}={v:.4f}" for k, v in eval_dict.items())
        self.logger.info(log_str)
        self.eval_logger.update({"iter": current_iter, **eval_dict})
        if self._wandb:
            self._wandb.log({"iter": current_iter,
                             **{f"eval_{k}": v for k, v in eval_dict.items()}})

    def log_train_loss(self, current_iter: int) -> None:
        avg = self.loss_recorder.get_avg_values()
        if self.opt.get("debug"):
            self.logger.info(
                f"loss iter{current_iter}: "
                + " ".join(f"{k}: {v:.3f}" for k, v in avg.items()))
        self.train_logger.update({"iter": current_iter, **avg})
        if self._wandb and current_iter % self.opt.get("wandb_loss_step",
                                                       10000) == 0:
            self._wandb.log({"iter": current_iter, **avg})
        self.loss_recorder.reset()

    def log_time(self, current_iter: int) -> None:
        stat = self.time_recorder.get_time_stat(current_iter)
        self.logger.info(
            f"iter {current_iter}: {stat['iter_per_sec']:.2f} it/s, "
            f"eta {stat['eta_hours']:.2f}h")
        if self._wandb:
            self._wandb.log({"iter": current_iter, **stat})

    def save(self, current_iter: int) -> None:
        raise NotImplementedError

    def load_checkpoint(self, exp: str, itr: int, **kwargs) -> None:
        raise NotImplementedError

    @staticmethod
    def batch_to_float(batch):
        """uint8 batches (uint8_io datasets) convert ON DEVICE with the exact
        ``uint8_to_tensor`` formula; float batches pass through.  Shipping
        uint8 quarters the per-step h2d upload."""
        if batch.dtype == jnp.uint8:
            return (batch.astype(jnp.float32) / 255.0 - 0.5) * 2.0
        return batch

    @staticmethod
    def loss_anomaly_flag(l_total):
        """Traced NaN/Inf/huge guard (reference base_trainer.py:228-238)."""
        return (jnp.isnan(l_total) | jnp.isinf(l_total) | (l_total > 10000.0))

    @staticmethod
    def select_update(skip, new, old):
        """Skip the whole update when the loss anomaly flag is set."""
        return jax.tree.map(
            lambda n, o: jnp.where(skip, o, n), new, old)
