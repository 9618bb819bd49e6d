"""Rate-distortion trainer (stages 1-2; reference rate_distortion_trainer.py).

One jitted step: forward (noise/STE quantization) -> distortion + rate
(+ perceptual) losses -> grads -> clipped Adam update -> aux (quantiles) update,
with the NaN/Inf/huge-loss skip applied as a traced select.  rate_ind/beta are
sampled host-side per iteration and fed as traced scalars so every iteration
reuses one compiled program.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..models.comp_model import _rate_summary
from ..utils.registry import TRAINER_REGISTRY
from ..utils.saver import load_pytree
from .base_trainer import BaseTrainer, TrainState
from .optimizer import build_optimizer


@TRAINER_REGISTRY.register()
class RateDistortionTrainer(BaseTrainer):
    def set_losses(self) -> None:
        loss_opt = self.opt.loss
        self.distortion_loss = build_loss(loss_opt.distortion_loss)
        self.rate_loss = build_loss(loss_opt.rate_loss)
        if loss_opt.get("perceptual_loss"):
            self.perceptual_loss = build_loss(loss_opt.perceptual_loss)
        else:
            self.logger.warning("perceptual_loss is NOT built")
            self.perceptual_loss = None

    def set_optimizer_scheduler(self) -> None:
        optim_opt = self.opt.optim
        clip = optim_opt.get("clip_max_norm", None)
        self.g_tx = build_optimizer(optim_opt.g_optimizer,
                                    optim_opt.get("g_scheduler"), clip)
        # aux optimizer acts only on the entropy-bottleneck quantiles
        aux_mask = jax.tree_util.tree_map_with_path(
            lambda p, _: any(getattr(k, "key", None) == "quantiles"
                             for k in p),
            self.comp_model.params)
        self._aux_mask = aux_mask
        if optim_opt.get("aux_optimizer"):
            self.aux_tx = build_optimizer(optim_opt.aux_optimizer, None, None,
                                          mask=aux_mask)
        else:
            self.aux_tx = None

    def init_state(self) -> TrainState:
        params = self.comp_model.params
        return TrainState(
            step=self.opt.start_iter,
            params=params,
            opt_state=self.g_tx.init(params),
            aux_opt_state=self.aux_tx.init(params) if self.aux_tx else None,
        )

    # ------------------ the jitted step ------------------

    def _g_losses(self, params, batch, rate_ind, beta, rng, mults,
                  loss_consts=None):
        """Forward + G-side losses. Shared by RD and GAN trainers.

        With ``mixed_precision: True`` the conv transforms run in bfloat16
        (entropy math stays f32 — see entropy/gaussian.py); losses and grads
        accumulate in f32.
        """
        model = self.comp_model
        kw = {}
        if model.use_rate:
            kw["rate_ind"] = rate_ind
        if model.use_beta:
            kw["beta"] = beta
        x_in = batch
        if self.opt.get("mixed_precision", False):
            x_in = batch.astype(jnp.bfloat16)
        out = model.net.apply({"params": params}, x_in, is_train=True,
                              rng=rng, **kw)
        num_pixel = batch.shape[1] * batch.shape[2]
        summary = _rate_summary(out, num_pixel)
        real = batch
        fake = out["fake_images"].astype(jnp.float32)

        losses = {
            "distortion": self.distortion_loss(real, fake),
            "rate": self.rate_loss(summary["bpp"], summary["qbpp"],
                                   rate_ind=rate_ind, lambda_mult=mults[0],
                                   target_mult=mults[1]),
        }
        if self.perceptual_loss:
            lpips_vars = (loss_consts or {}).get("lpips")
            losses["perceptual"] = self.perceptual_loss(
                real, fake, variables=lpips_vars)
        return losses, out, summary

    def _loss_consts(self):
        """Frozen loss-network weights (LPIPS features), passed into the
        jitted step as traced args so they never become HLO literals."""
        if not hasattr(self, "_loss_consts_cached"):
            if self.perceptual_loss:
                v = self.perceptual_loss.variables
                v = self._replicate(v) if self.mesh is not None \
                    else jax.device_put(v)
                self._loss_consts_cached = {"lpips": v}
            else:
                self._loss_consts_cached = {}
        return self._loss_consts_cached

    def _make_step(self):
        model = self.comp_model

        def step_fn(state: TrainState, batch, rate_ind, beta, rng, mults,
                    loss_consts):
            batch = self.batch_to_float(batch)

            def loss_fn(params):
                losses, out, summary = self._g_losses(params, batch, rate_ind,
                                                      beta, rng, mults,
                                                      loss_consts)
                l_total = sum(losses.values())
                return l_total, (losses, summary)

            (l_total, (losses, summary)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            skip = self.loss_anomaly_flag(l_total)

            updates, new_opt = self.g_tx.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)

            log = {**losses, "total": l_total, "qbpp": jnp.mean(summary["qbpp"]),
                   "bpp": jnp.mean(summary["bpp"]), "skipped": skip}

            if self.aux_tx is not None:
                def aux_fn(params):
                    return model.net.apply({"params": params},
                                           method=lambda n: n.aux_loss())
                aux_loss, aux_grads = jax.value_and_grad(aux_fn)(new_params)
                aux_updates, new_aux_opt = self.aux_tx.update(
                    aux_grads, state.aux_opt_state, new_params)
                new_params = optax.apply_updates(new_params, aux_updates)
                log["aux"] = aux_loss
            else:
                new_aux_opt = state.aux_opt_state

            # NaN-skip: keep the old state entirely
            new_params = self.select_update(skip, new_params, state.params)
            new_opt = self.select_update(skip, new_opt, state.opt_state)
            if self.aux_tx is not None:
                new_aux_opt = self.select_update(skip, new_aux_opt,
                                                 state.aux_opt_state)

            new_state = state.replace(step=state.step + 1, params=new_params,
                                      opt_state=new_opt,
                                      aux_opt_state=new_aux_opt)
            return new_state, log

        return self._jit_step(step_fn)

    def optimize_parameters_device(self, itr: int, data: Dict) -> Dict:
        """One fused optimization step; returns the log dict as DEVICE
        scalars (no host sync).  The train loop accumulates these and
        flushes them in one batched ``device_get`` at every log boundary
        (base_trainer._flush_device_logs) — per-iter host pulls both
        serialize the step pipeline and are the exact point a wedged
        relay freezes training (endurance_r5 stall postmortems)."""
        if not hasattr(self, "_step_fn"):
            self._step_fn = self._make_step()
        model = self.comp_model
        batch = self._put_batch(data["real_images"])
        rate_ind = jnp.asarray(
            [model.sample_rate_ind() if model.use_rate else 0.0], jnp.float32)
        beta = jnp.asarray(
            [model.sample_beta() if model.use_beta else 0.0], jnp.float32)
        mults = jnp.asarray(self.rate_loss.schedule_mults(itr), jnp.float32) \
            if hasattr(self.rate_loss, "schedule_mults") \
            else jnp.ones((2,), jnp.float32)
        self.state, log = self._step_fn(self.state, batch, rate_ind, beta,
                                        self.next_rng(), mults,
                                        self._loss_consts())
        return log

    def optimize_parameters(self, itr: int, data: Dict) -> Optional[Dict]:
        log = self.optimize_parameters_device(itr, data)
        log = {k: float(np.asarray(v)) for k, v in log.items()}
        if log.pop("skipped", 0.0) > 0:
            self.logger.warning(f"iter{itr}: skipped (loss anomaly)")
            return None
        return log

    # ------------------ save / load ------------------

    def save(self, current_iter: int) -> None:
        self.comp_model.params = self.state.params
        self.model_saver.save({"comp_model": {"params":
                                              jax.device_get(self.state.params)}},
                              "comp_model", current_iter, keep=True)
        training_state = {
            "opt_state": jax.device_get(self.state.opt_state),
            "aux_opt_state": jax.device_get(self.state.aux_opt_state),
        }
        self.model_saver.save(training_state, "training_state", current_iter,
                              keep=self.opt.get("keep_training_state", False))

    def load_checkpoint(self, exp: str, itr: int, load_optimizer: bool = True,
                        **kwargs) -> None:
        from ..utils.path import PathHandler

        ph = PathHandler(self.opt.ckpt_root, exp)
        ckpt = load_pytree(ph.get_ckpt_path("comp_model", itr))
        self.state = self.state.replace(
            params=jax.device_put(ckpt["comp_model"]["params"]), step=itr)
        self.comp_model.params = self.state.params
        if load_optimizer:
            ts_path = ph.get_ckpt_path("training_state", itr)
            strict = bool(self.opt.get("strict_resume", False))
            try:
                ts = load_pytree(ts_path)
                self.state = self.state.replace(
                    opt_state=_restore_like(self.state.opt_state,
                                            ts["opt_state"], name="opt_state",
                                            strict=strict, logger=self.logger),
                    aux_opt_state=_restore_like(self.state.aux_opt_state,
                                                ts.get("aux_opt_state"),
                                                name="aux_opt_state",
                                                strict=strict,
                                                logger=self.logger))
            except FileNotFoundError:
                self.logger.warning(f"no training state at {ts_path}")
        self.logger.info(f"checkpoint loaded: exp={exp} iter={itr}")


def _restore_like(template, data, name="state", strict=False, logger=None):
    """Restore a serialized pytree into the structure of ``template``.

    A topology change between save and resume (renamed/added/removed params)
    is surfaced loudly: the reference loads optimizer state strictly
    (rate_distortion_trainer.py:115-163 via torch load_state_dict), so a
    silent re-initialization of Adam moments would be a behavior divergence.
    ``strict=False`` warns and restarts from the fresh template;
    ``strict=True`` (config ``strict_resume: true``) raises.
    """
    if data is None or template is None:
        return template
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves_d = jax.tree_util.tree_leaves(data)
    mismatch = None
    if len(leaves_t) != len(leaves_d):
        mismatch = (f"leaf count {len(leaves_d)} in checkpoint vs "
                    f"{len(leaves_t)} expected")
    else:
        for i, (t, d) in enumerate(zip(leaves_t, leaves_d)):
            t_shape = tuple(np.shape(t))
            d_shape = tuple(np.shape(d))
            if t_shape != d_shape:
                mismatch = (f"leaf {i} has shape {d_shape} in checkpoint vs "
                            f"{t_shape} expected")
                break
    if mismatch:
        msg = (f"optimizer state '{name}' does not match the current "
               f"parameter topology ({mismatch}) — the model changed between "
               f"save and resume")
        if strict:
            raise ValueError(msg + " (strict_resume is set)")
        (logger.warning if logger else
         __import__("warnings").warn)(
            msg + "; re-initializing this optimizer state from scratch")
        return template
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(d) for d in leaves_d])
