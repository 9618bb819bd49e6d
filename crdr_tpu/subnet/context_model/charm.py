"""Channel-autoregressive (Charm) context model, Minnen & Singh ICIP 2020.

Contract: reference minnen20_charm_context_model.py:41-240 —

* y (320 ch) split into ``num_slices=10`` slices of 32 ch; supports capped at
  ``max_support_slices=5``;
* per slice, three SliceTransform CNNs (conv5->224, actv, conv5->128, actv,
  conv3->slice_ch): mean on [hyper_mean || y_hat_<i], scale likewise on
  hyper_scale, and an LRP whose ``0.5*tanh`` output is added to the slice;
* training/eval forward evaluates likelihoods slice by slice (unrolled into a
  single XLA program — 10 static iterations, 30 convs, all MXU work);
* codec paths expose per-slice parameter/LRP computation so the host rANS
  decoder can interleave with device CNNs during the serial decode.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d
from ...utils.registry import CONTEXTMODEL_REGISTRY

Array = jax.Array

_ACTV = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.2),
}


class SliceTransform(nn.Module):
    out_ch: int
    actv: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = _ACTV[self.actv]
        x = act(Conv2d(224, 5, 1, 2, name="model_0")(x))
        x = act(Conv2d(128, 5, 1, 2, name="model_2")(x))
        return Conv2d(self.out_ch, 3, 1, 1, name="model_4")(x)


@CONTEXTMODEL_REGISTRY.register()
class Minnen20CharmContextModel(nn.Module):
    num_slices: int
    bottleneck_y: int
    hyper_out_ch: int
    max_support_slices: int = 5
    slice_transform_kwargs: Dict = None
    crop_gaussian_params: bool = False

    def setup(self):
        assert self.bottleneck_y % self.num_slices == 0
        assert (self.max_support_slices == -1
                or 1 <= self.max_support_slices <= self.num_slices)
        kwargs = dict(self.slice_transform_kwargs or {})
        slice_ch = self.bottleneck_y // self.num_slices
        self.slice_ch = slice_ch
        self.mean_transforms = [
            SliceTransform(slice_ch, name=f"mean_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)
        ]
        self.scale_transforms = [
            SliceTransform(slice_ch, name=f"scale_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            SliceTransform(slice_ch, name=f"lrp_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)
        ]

    def _supports(self, y_hat_slices: List[Array]) -> List[Array]:
        if self.max_support_slices < 0:
            return y_hat_slices
        return y_hat_slices[: self.max_support_slices]

    def __call__(self, y: Array, hyper_out: Array, entropy_model_y,
                 is_train: bool = True, rng: Optional[Array] = None,
                 calc_q_likelihood: bool = True):
        """Returns (y_hat, y_likelihood[, y_q_likelihood]); all NHWC."""
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices: List[Array] = []
        lik_slices: List[Array] = []
        q_lik_slices: List[Array] = []

        for i, y_slice in enumerate(y_slices):
            support = self._supports(y_hat_slices)
            mean_support = jnp.concatenate([hyper_mean] + support, axis=-1)
            scale_support = jnp.concatenate([hyper_scale] + support, axis=-1)
            mu = self.mean_transforms[i](mean_support)
            sigma = self.scale_transforms[i](scale_support)
            params = jnp.concatenate([mu, sigma], axis=-1)

            slice_rng = jax.random.fold_in(rng, i) if rng is not None else None
            y_hat_slice, lik = entropy_model_y(y_slice, params,
                                               is_train=is_train, rng=slice_rng)
            lik_slices.append(lik)
            if calc_q_likelihood:
                _, q_lik = entropy_model_y(y_slice, params, is_train=False)
                q_lik_slices.append(jax.lax.stop_gradient(q_lik))

            lrp_in = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
            lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
            y_hat_slices.append(y_hat_slice + lrp)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_likelihood = jnp.concatenate(lik_slices, axis=-1)
        if calc_q_likelihood:
            return y_hat, y_likelihood, jnp.concatenate(q_lik_slices, axis=-1)
        return y_hat, y_likelihood

    def forward_compress(self, y: Array, hyper_out: Array, entropy_model_y
                         ) -> Tuple[Array, Array, Array, Array]:
        """One XLA program computing everything the encoder needs:
        (y_mean, y_scale, y_hat, y_likelihood) for all slices."""
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices: List[Array] = []
        lik_slices: List[Array] = []
        mean_slices: List[Array] = []
        scale_slices: List[Array] = []

        for i, y_slice in enumerate(y_slices):
            support = self._supports(y_hat_slices)
            mean_support = jnp.concatenate([hyper_mean] + support, axis=-1)
            scale_support = jnp.concatenate([hyper_scale] + support, axis=-1)
            mu = self.mean_transforms[i](mean_support)
            sigma = self.scale_transforms[i](scale_support)
            mean_slices.append(mu)
            scale_slices.append(sigma)
            params = jnp.concatenate([mu, sigma], axis=-1)
            y_hat_slice, lik = entropy_model_y(y_slice, params, is_train=False)
            lik_slices.append(lik)
            lrp_in = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
            lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
            y_hat_slices.append(y_hat_slice + lrp)

        return (jnp.concatenate(mean_slices, axis=-1),
                jnp.concatenate(scale_slices, axis=-1),
                jnp.concatenate(y_hat_slices, axis=-1),
                jnp.concatenate(lik_slices, axis=-1))

    # ---- per-slice methods for the serial host decode ----------------------

    def slice_params(self, slice_ind: int, hyper_mean: Array,
                     hyper_scale: Array, support: Array) -> Tuple[Array, Array]:
        """(mu, sigma) for one slice.  ``support`` is the channel-concat of the
        already-decoded support slices (possibly zero-width)."""
        mean_support = jnp.concatenate([hyper_mean, support], axis=-1)
        scale_support = jnp.concatenate([hyper_scale, support], axis=-1)
        mu = self.mean_transforms[slice_ind](mean_support)
        sigma = self.scale_transforms[slice_ind](scale_support)
        return mu, sigma

    def slice_lrp(self, slice_ind: int, hyper_mean: Array, support: Array,
                  y_hat_slice: Array) -> Array:
        """LRP-corrected slice reconstruction."""
        lrp_in = jnp.concatenate([hyper_mean, support, y_hat_slice], axis=-1)
        lrp = 0.5 * jnp.tanh(self.lrp_transforms[slice_ind](lrp_in))
        return y_hat_slice + lrp
