"""The composed compression network as a single flax module.

One module class covers the whole reference model matrix (hyperprior / +Charm /
+InterpCA / +BetaCond — reference src/models/comp_model/*.py) via three flags
derived from the config; the jitted training/eval forward is a single XLA
program including the 10-slice Charm loop (statically unrolled).

Submodule names mirror the reference state_dict layout (encoder, decoder,
hyperencoder, hyperdecoder, entropy_model_z, entropy_model_y, context_model)
so weight import is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..subnet import build_subnet

Array = jax.Array


class CompNet(nn.Module):
    subnet_opt: Dict[str, Any]
    use_rate: bool = False
    use_beta: bool = False
    use_charm: bool = False
    # CompressAI-compat [0,1] image range (reference base_model.py:22-27);
    # affects the eval-path clamp bounds
    img_range_01: bool = False

    def setup(self):
        opt = self.subnet_opt
        self.encoder = build_subnet(opt["encoder"], "encoder", name="encoder")
        self.decoder = build_subnet(opt["decoder"], "decoder", name="decoder")
        self.hyperencoder = build_subnet(opt["hyperencoder"], "hyperencoder",
                                         name="hyperencoder")
        self.hyperdecoder = build_subnet(opt["hyperdecoder"], "hyperdecoder",
                                         name="hyperdecoder")
        self.entropy_model_z = build_subnet(opt["entropy_model_z"],
                                            "entropy_model",
                                            name="entropy_model_z")
        self.entropy_model_y = build_subnet(opt["entropy_model_y"],
                                            "entropy_model",
                                            name="entropy_model_y")
        if self.use_charm:
            self.context_model = build_subnet(opt["context_model"],
                                              "context_model",
                                              name="context_model")

    # ---- building-block calls --------------------------------------------

    def encode(self, x: Array, rate_ind=None) -> Array:
        if self.use_rate:
            return self.encoder(x, rate_ind)
        return self.encoder(x)

    def decode(self, y_hat: Array, rate_ind=None, beta=None) -> Array:
        if self.use_beta:
            return self.decoder(y_hat, rate_ind, beta)
        if self.use_rate:
            return self.decoder(y_hat, rate_ind)
        return self.decoder(y_hat)

    def hyper_encode(self, y: Array) -> Array:
        return self.hyperencoder(y)

    def hyper_decode(self, z_hat: Array) -> Array:
        return self.hyperdecoder(z_hat)

    def z_forward(self, z: Array, is_train: bool, rng=None):
        return self.entropy_model_z(z, is_train=is_train, rng=rng)

    def aux_loss(self) -> Array:
        """Aggregated aux loss of the entropy bottleneck(s)
        (reference base_model.py:68-78)."""
        return self.entropy_model_z.loss()

    # ---- full forward (training / eval) ----------------------------------

    def __call__(self, x: Array, rate_ind=None, beta=None,
                 is_train: bool = True, rng: Optional[Array] = None,
                 calc_q_likelihood: bool = True) -> Dict:
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        y = self.encode(x, rate_ind)
        z = self.hyperencoder(y)
        z_hat, z_likelihood = self.entropy_model_z(z, is_train=is_train,
                                                   rng=rngs[0])
        hyper_out = self.hyperdecoder(z_hat)

        if self.use_charm:
            y_hat, y_likelihood, y_q_likelihood = self.context_model(
                y, hyper_out, self.entropy_model_y, is_train=is_train,
                rng=rngs[1], calc_q_likelihood=True)
        else:
            y_hat, y_likelihood = self.entropy_model_y(
                y, hyper_out, is_train=is_train, rng=rngs[1])
            _, y_q_likelihood = self.entropy_model_y(y, hyper_out,
                                                     is_train=False)
            y_q_likelihood = jax.lax.stop_gradient(y_q_likelihood)

        fake_images = self.decode(y_hat, rate_ind, beta)
        if not is_train:
            lo = 0.0 if self.img_range_01 else -1.0
            fake_images = jnp.clip(fake_images, lo, 1.0)

        _, z_q_likelihood = self.entropy_model_z(z, is_train=False)
        z_q_likelihood = jax.lax.stop_gradient(z_q_likelihood)

        return {
            "fake_images": fake_images,
            "likelihoods": {"y": y_likelihood, "z": z_likelihood},
            "latent_code": {"y": y, "z": z},
            "quantized_code": {"y": y_hat, "z": z_hat},
            "q_likelihoods": {"y": y_q_likelihood, "z": z_q_likelihood},
        }

    # ---- codec-path programs ---------------------------------------------

    def encode_latents(self, x: Array, rate_ind=None):
        """Encoder + hyper-encoder in one program (compress step 1)."""
        y = self.encode(x, rate_ind)
        z = self.hyperencoder(y)
        return y, z

    def compress_params(self, y: Array, z_hat: Array):
        """Everything the entropy encoder needs, in one program:
        hyper_out -> (per-slice) mu/sigma, y_hat, y_likelihood."""
        hyper_out = self.hyperdecoder(z_hat)
        if self.use_charm:
            y_mean, y_scale, y_hat, y_lik = self.context_model.forward_compress(
                y, hyper_out, self.entropy_model_y)
        else:
            y_mean, y_scale = jnp.split(hyper_out, 2, axis=-1)
            y_hat, y_lik = self.entropy_model_y(y, hyper_out, is_train=False)
        return y_mean, y_scale, y_hat, y_lik

    def z_likelihood_eval(self, z: Array):
        _, lik = self.entropy_model_z(z, is_train=False)
        return lik

    def charm_slice_params(self, slice_ind: int, hyper_mean: Array,
                           hyper_scale: Array, support: Array):
        return self.context_model.slice_params(slice_ind, hyper_mean,
                                               hyper_scale, support)

    def charm_slice_lrp(self, slice_ind: int, hyper_mean: Array,
                        support: Array, y_hat_slice: Array):
        return self.context_model.slice_lrp(slice_ind, hyper_mean, support,
                                            y_hat_slice)

