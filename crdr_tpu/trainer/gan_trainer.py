"""GAN trainers: vanilla, relativistic (RGAN/RaGAN), and the multi-rate
high-rate-relative (HRRGAN) beta-conditioned stage-3 trainer.

Reference contracts (src/trainer/*.py):

* G step with D frozen, then D step on real/fake * 0.5 each
  (gan_rate_distortion_trainer.py:46-119);
* RGAN compares D(real)-D(fake) pairs (rgan_..._trainer.py:33-39);
* RaGAN compares against the mean prediction (ragan_..._trainer.py:31-37);
* HRRGAN's "real" anchor is the same model's output at rate_ind+1 (no-grad
  forward), or the true image at the top rate
  (multirate_hr_rgan_rate_distortion_trainer.py:31-38);
* stage 3 weights perceptual+adv by the sampled beta
  (multirate_hr_rgan_beta_cond_rate_distortion_trainer.py:31-64).

TPU-first: G forward + anchor forward + both D passes + both optimizer updates
are ONE jitted program; the anchor branch uses ``lax.cond`` so the top-rate
case skips the extra decoder pass.  The torch ``.detach()``/requires_grad
choreography maps to ``stop_gradient`` + differentiating w.r.t. one param tree
at a time.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..models.comp_model import _rate_summary
from ..subnet.discriminator import build_discriminator
from ..utils.registry import TRAINER_REGISTRY
from ..utils.saver import load_pytree
from .base_trainer import TrainState
from .optimizer import build_optimizer
from .rd_trainer import RateDistortionTrainer, _restore_like


@TRAINER_REGISTRY.register()
class GANRateDistortionTrainer(RateDistortionTrainer):
    adv_mode = "vanilla"  # vanilla | rgan | ragan

    def set_models(self) -> None:
        super().set_models()
        self.discriminator = build_discriminator(self.opt.discriminator)
        # init D variables on a dummy batch
        size = self.opt.dataset.train_dataset.get("image_size", 256)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        d_kwargs = self._d_kwargs_dummy()
        variables = self.discriminator.init(
            jax.random.PRNGKey(self.opt.get("seed", 0) + 1), dummy, **d_kwargs)
        self.d_params = variables["params"]
        self.d_stats = {k: v for k, v in variables.items() if k != "params"}

    def _d_kwargs_dummy(self) -> Dict:
        kw: Dict[str, Any] = {}
        if self.comp_model.use_rate:
            kw["rate_ind"] = 0
        if "Conditional" in self.opt.discriminator.type:
            # latent-conditional discriminators take y_hat (/16 latent)
            size = self.opt.dataset.train_dataset.get("image_size", 256)
            y_ch = self.opt.discriminator.get("y_ch", 192)
            kw["y_hat"] = jnp.zeros((1, size // 16, size // 16, y_ch),
                                    jnp.float32)
        return kw

    def _d_apply(self, d_params, d_stats, x, rate_ind=None, y_hat=None):
        variables = {"params": d_params, **(d_stats or {})}
        kwargs: Dict[str, Any] = {}
        if self.comp_model.use_rate and rate_ind is not None:
            kwargs["rate_ind"] = rate_ind
        if y_hat is not None:
            kwargs["y_hat"] = y_hat
        mutable = list(d_stats.keys()) if d_stats else False
        if mutable:
            out, new_stats = self.discriminator.apply(
                variables, x, train=True, mutable=mutable, **kwargs)
            return out, new_stats
        return self.discriminator.apply(variables, x, train=True, **kwargs), \
            d_stats

    def set_losses(self) -> None:
        super().set_losses()
        self.gan_loss = build_loss(self.opt.loss.gan_loss)

    def set_optimizer_scheduler(self) -> None:
        super().set_optimizer_scheduler()
        optim_opt = self.opt.optim
        self.d_tx = build_optimizer(optim_opt.d_optimizer,
                                    optim_opt.get("d_scheduler"), None)

    def init_state(self) -> TrainState:
        params = self.comp_model.params
        return TrainState(
            step=self.opt.start_iter,
            params=params,
            opt_state=self.g_tx.init(params),
            aux_opt_state=self.aux_tx.init(params) if self.aux_tx else None,
            d_params=self.d_params,
            d_opt_state=self.d_tx.init(self.d_params),
            d_stats=self.d_stats,
        )

    # ---- adv loss shapes --------------------------------------------------

    def _g_adv(self, fake_pred, anchor_pred):
        """G-side adversarial loss given D(fake) (live) and D(anchor) (sg)."""
        anchor_pred = jax.lax.stop_gradient(anchor_pred)
        if self.adv_mode == "vanilla":
            return self.gan_loss(fake_pred, is_real=True, is_disc=False)
        if self.adv_mode == "rgan":
            l_real = self.gan_loss(anchor_pred - fake_pred, is_real=False,
                                   is_disc=False)
            l_fake = self.gan_loss(fake_pred - anchor_pred, is_real=True,
                                   is_disc=False)
            return (l_real + l_fake) / 2.0
        if self.adv_mode == "ragan":
            l_real = self.gan_loss(anchor_pred - jnp.mean(fake_pred),
                                   is_real=False, is_disc=False)
            l_fake = self.gan_loss(fake_pred - jnp.mean(anchor_pred),
                                   is_real=True, is_disc=False)
            return (l_real + l_fake) / 2.0
        raise ValueError(self.adv_mode)

    def _d_loss(self, real_pred, fake_pred):
        sg = jax.lax.stop_gradient
        if self.adv_mode == "vanilla":
            l_real = self.gan_loss(real_pred, is_real=True, is_disc=True) * 0.5
            l_fake = self.gan_loss(fake_pred, is_real=False, is_disc=True) * 0.5
        elif self.adv_mode == "rgan":
            l_real = self.gan_loss(real_pred - sg(fake_pred), is_real=True,
                                   is_disc=True) * 0.5
            l_fake = self.gan_loss(fake_pred - sg(real_pred), is_real=False,
                                   is_disc=True) * 0.5
        elif self.adv_mode == "ragan":
            l_real = self.gan_loss(real_pred - jnp.mean(sg(fake_pred)),
                                   is_real=True, is_disc=True) * 0.5
            l_fake = self.gan_loss(fake_pred - jnp.mean(sg(real_pred)),
                                   is_real=False, is_disc=True) * 0.5
        else:
            raise ValueError(self.adv_mode)
        return l_real, l_fake

    # ---- anchor (overridden by HRRGAN) ------------------------------------

    def _anchor_images(self, params, batch, rate_ind, beta, rng):
        """The 'real' reference for the adversarial comparison."""
        return batch

    def _beta_weighting(self) -> bool:
        """Whether l_total = dist + rate + beta * (percep + adv)."""
        return False

    # ---- the fused G+D step ------------------------------------------------

    def _make_step(self):
        model = self.comp_model

        def step_fn(state: TrainState, batch, rate_ind, beta, rng, mults,
                    loss_consts):
            batch = self.batch_to_float(batch)
            rng_g, rng_anchor = jax.random.split(rng)
            anchor = self._anchor_images(state.params, batch, rate_ind, beta,
                                         rng_anchor)
            anchor = jax.lax.stop_gradient(anchor)

            # ---------------- G step ----------------
            def g_loss_fn(params):
                losses, out, summary = self._g_losses(params, batch, rate_ind,
                                                      beta, rng_g, mults,
                                                      loss_consts)
                fake = out["fake_images"]
                y_hat = out["quantized_code"]["y"]
                fake_pred, _ = self._d_apply(
                    jax.lax.stop_gradient(state.d_params), state.d_stats,
                    fake, rate_ind, y_hat)
                anchor_pred, _ = self._d_apply(
                    jax.lax.stop_gradient(state.d_params), state.d_stats,
                    anchor, rate_ind, y_hat)
                losses["adv"] = self._g_adv(fake_pred, anchor_pred)
                if self._beta_weighting():
                    b = jnp.asarray(beta).reshape(-1)[0]
                    l_total = losses["distortion"] + losses["rate"] + \
                        b * (losses["perceptual"] + losses["adv"])
                else:
                    l_total = sum(losses.values())
                return l_total, (losses, out, summary)

            (l_total, (losses, out, summary)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params)
            skip = self.loss_anomaly_flag(l_total)

            updates, new_opt = self.g_tx.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)

            log = {**losses, "total": l_total,
                   "qbpp": jnp.mean(summary["qbpp"]),
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

            new_params = self.select_update(skip, new_params, state.params)
            new_opt = self.select_update(skip, new_opt, state.opt_state)
            if self.aux_tx is not None:
                new_aux_opt = self.select_update(skip, new_aux_opt,
                                                 state.aux_opt_state)

            # ---------------- D step ----------------
            # (the HRRGAN anchor is G-side only; D always sees true images —
            # reference multirate_hr_rgan_..._trainer.py:85-113)
            fake_sg = jax.lax.stop_gradient(out["fake_images"])
            y_hat_sg = jax.lax.stop_gradient(out["quantized_code"]["y"])

            def d_loss_fn(d_params):
                real_pred, stats1 = self._d_apply(d_params, state.d_stats,
                                                  batch, rate_ind, y_hat_sg)
                fake_pred, stats2 = self._d_apply(d_params, stats1, fake_sg,
                                                  rate_ind, y_hat_sg)
                l_real, l_fake = self._d_loss(real_pred, fake_pred)
                aux = (l_real, l_fake, jnp.mean(real_pred),
                       jnp.mean(fake_pred), stats2)
                return l_real + l_fake, aux

            (d_total, (l_real, l_fake, out_real, out_fake, new_d_stats)), \
                d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.d_params)
            d_updates, new_d_opt = self.d_tx.update(d_grads, state.d_opt_state,
                                                    state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)

            new_d_params = self.select_update(skip, new_d_params,
                                              state.d_params)
            new_d_opt = self.select_update(skip, new_d_opt, state.d_opt_state)

            log.update({"d_real": l_real, "d_fake": l_fake, "d_total": d_total,
                        "out_d_real": out_real, "out_d_fake": out_fake})

            new_state = state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                aux_opt_state=new_aux_opt, d_params=new_d_params,
                d_opt_state=new_d_opt, d_stats=new_d_stats)
            return new_state, log

        return self._jit_step(step_fn)

    def save(self, current_iter: int) -> None:
        super().save(current_iter)
        self.model_saver.save(
            {"discriminator": {"params": jax.device_get(self.state.d_params),
                               "stats": jax.device_get(self.state.d_stats)}},
            "discriminator", current_iter,
            keep=self.opt.get("keep_discriminator", False))

    def load_checkpoint(self, exp: str, itr: int, load_optimizer: bool = True,
                        load_discriminator: bool = True, **kwargs) -> None:
        super().load_checkpoint(exp, itr, load_optimizer=load_optimizer,
                                **kwargs)
        if not load_discriminator:
            return
        from ..utils.path import PathHandler

        ph = PathHandler(self.opt.ckpt_root, exp)
        try:
            ckpt = load_pytree(ph.get_ckpt_path("discriminator", itr))
            self.state = self.state.replace(
                d_params=_restore_like(
                    self.state.d_params, ckpt["discriminator"]["params"],
                    name="d_params",
                    strict=bool(self.opt.get("strict_resume", False)),
                    logger=self.logger))
        except FileNotFoundError:
            self.logger.warning("discriminator checkpoint not found")


@TRAINER_REGISTRY.register()
class RGANRateDistortionTrainer(GANRateDistortionTrainer):
    adv_mode = "rgan"


@TRAINER_REGISTRY.register()
class RaGANRateDistortionTrainer(GANRateDistortionTrainer):
    adv_mode = "ragan"


@TRAINER_REGISTRY.register()
class BetaCondRGANRateDistortionTrainer(RGANRateDistortionTrainer):
    """RGAN vs real images with beta-weighted perceptual+adv
    (reference beta_cond_rgan_rate_distortion_trainer.py:48)."""

    def _beta_weighting(self) -> bool:
        return True


@TRAINER_REGISTRY.register()
class MultirateHighRateRGANRateDistortionTrainer(RGANRateDistortionTrainer):
    """HRRGAN: the relativistic anchor is the model's own output at
    rate_ind + 1, or the true image at the top rate."""

    relative_score_rate_delta = 1

    def _anchor_images(self, params, batch, rate_ind, beta, rng):
        model = self.comp_model
        rate_level = model.rate_level
        high = jnp.asarray(rate_ind).reshape(-1)[0] + \
            self.relative_score_rate_delta

        def use_real(_):
            return batch

        def use_model(_):
            kw = {"rate_ind": jnp.reshape(high, (1,))}
            if model.use_beta:
                kw["beta"] = beta
            out = model.net.apply({"params": params}, batch, is_train=True,
                                  rng=rng, **kw)
            return out["fake_images"]

        return jax.lax.cond(high > rate_level - 1, use_real, use_model,
                            operand=None)


@TRAINER_REGISTRY.register()
class MultirateBetaCondHrrGanRateDistortionTrainer(
        MultirateHighRateRGANRateDistortionTrainer):
    """Stage 3: HRRGAN + beta-weighted loss
    (reference multirate_hr_rgan_beta_cond_rate_distortion_trainer.py:31-64)."""

    def _beta_weighting(self) -> bool:
        return True
