"""Checkerboard space-channel context model (ELIC, He et al. CVPR 2022).

Capability extension beyond the reference (BASELINE.json north star names the
"channel-autoregressive + checkerboard spatial context"): within each channel
slice, latent positions split into a checkerboard of anchors ((h+w) even) and
non-anchors.  Anchors are coded from the channel context alone (as Charm);
non-anchors additionally condition on the decoded anchors through one masked
5x5 conv.  The spatial autoregression therefore needs only TWO dense passes
per slice — no serial spatial loop — which is exactly the structure the MXU
wants.

Rate improves over pure Charm at equal slice count because half the positions
see a spatial context; decode stays at 2 host rANS calls per slice.

Checkerboard extraction uses static-shape subgrids (no dynamic masking):
anchors = x[0::2, 0::2] + x[1::2, 1::2]; non-anchors the other two subgrids.
Symbol serialization order: per slice, anchors (channel-major, subgrid A1 then
A2) then non-anchors (NA1 then NA2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d
from ...utils.registry import CONTEXTMODEL_REGISTRY
from .charm import SliceTransform

Array = jax.Array


def anchor_mask(h: int, w: int, dtype=jnp.float32) -> Array:
    """[H, W] with 1 at anchors ((h+w) % 2 == 0)."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((hh + ww) % 2 == 0).astype(dtype)


def split_checkerboard(x: Array) -> Tuple[Array, Array, Array, Array]:
    """NHWC -> (A1, A2, NA1, NA2) static-shape subgrids."""
    return (x[:, 0::2, 0::2], x[:, 1::2, 1::2],
            x[:, 0::2, 1::2], x[:, 1::2, 0::2])


def merge_checkerboard(a1: Array, a2: Array, na1: Array, na2: Array) -> Array:
    n, h2, w2, c = a1.shape
    out = jnp.zeros((n, h2 * 2, w2 * 2, c), a1.dtype)
    out = out.at[:, 0::2, 0::2].set(a1)
    out = out.at[:, 1::2, 1::2].set(a2)
    out = out.at[:, 0::2, 1::2].set(na1)
    out = out.at[:, 1::2, 0::2].set(na2)
    return out


@CONTEXTMODEL_REGISTRY.register()
class ElicCheckerboardCharmContextModel(nn.Module):
    """Charm channel context + checkerboard spatial context per slice."""

    num_slices: int
    bottleneck_y: int
    hyper_out_ch: int
    max_support_slices: int = 5
    slice_transform_kwargs: Dict = None

    def setup(self):
        assert self.bottleneck_y % self.num_slices == 0
        kwargs = dict(self.slice_transform_kwargs or {})
        sc = self.bottleneck_y // self.num_slices
        self.slice_ch = sc
        self.mean_transforms = [
            SliceTransform(sc, name=f"mean_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)]
        self.scale_transforms = [
            SliceTransform(sc, name=f"scale_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)]
        self.lrp_transforms = [
            SliceTransform(sc, name=f"lrp_slice_transforms_{i}", **kwargs)
            for i in range(self.num_slices)]
        # one 5x5 conv per slice mapping anchor-masked y_hat -> param deltas
        self.spatial_transforms = [
            Conv2d(2 * sc, 5, 1, 2, name=f"spatial_transforms_{i}")
            for i in range(self.num_slices)]

    def _supports(self, slices: List[Array]) -> List[Array]:
        if self.max_support_slices < 0:
            return slices
        return slices[: self.max_support_slices]

    def _slice_params(self, i: int, hyper_mean, hyper_scale, support):
        mean_in = jnp.concatenate([hyper_mean] + support, axis=-1)
        scale_in = jnp.concatenate([hyper_scale] + support, axis=-1)
        return (self.mean_transforms[i](mean_in),
                self.scale_transforms[i](scale_in), mean_in)

    def _spatial_delta(self, i: int, y_hat_anchor_masked: Array):
        delta = self.spatial_transforms[i](y_hat_anchor_masked)
        return jnp.split(delta, 2, axis=-1)  # (d_mu, d_sigma)

    def __call__(self, y: Array, hyper_out: Array, entropy_model_y,
                 is_train: bool = True, rng: Optional[Array] = None,
                 calc_q_likelihood: bool = True):
        n, h, w, _ = y.shape
        amask = anchor_mask(h, w, y.dtype)[None, :, :, None]
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices: List[Array] = []
        liks: List[Array] = []
        q_liks: List[Array] = []

        for i, y_slice in enumerate(y_slices):
            support = self._supports(y_hat_slices)
            mu, sigma, mean_in = self._slice_params(i, hyper_mean, hyper_scale,
                                                    support)
            # pass 1: quantize anchors with the channel-context params
            y_hat_a, _ = entropy_model_y(
                y_slice, jnp.concatenate([mu, sigma], axis=-1),
                is_train=False)
            y_hat_a = y_hat_a * amask
            d_mu, d_sigma = self._spatial_delta(i, y_hat_a)
            mu_c = mu + d_mu * (1.0 - amask)
            sigma_c = sigma + d_sigma * (1.0 - amask)
            params = jnp.concatenate([mu_c, sigma_c], axis=-1)

            slice_rng = jax.random.fold_in(rng, i) if rng is not None else None
            y_hat_slice, lik = entropy_model_y(y_slice, params,
                                               is_train=is_train,
                                               rng=slice_rng)
            liks.append(lik)
            if calc_q_likelihood:
                _, q = entropy_model_y(y_slice, params, is_train=False)
                q_liks.append(jax.lax.stop_gradient(q))

            lrp_in = jnp.concatenate([mean_in, y_hat_slice], axis=-1)
            lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
            y_hat_slices.append(y_hat_slice + lrp)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        lik = jnp.concatenate(liks, axis=-1)
        if calc_q_likelihood:
            return y_hat, lik, jnp.concatenate(q_liks, axis=-1)
        return y_hat, lik

    def forward_compress(self, y: Array, hyper_out: Array, entropy_model_y):
        """(y_mean_c, y_scale_c, y_hat, y_likelihood) with the combined
        anchor/non-anchor parameters (decodable ordering guaranteed)."""
        n, h, w, _ = y.shape
        amask = anchor_mask(h, w, y.dtype)[None, :, :, None]
        y_slices = jnp.split(y, self.num_slices, axis=-1)
        hyper_mean, hyper_scale = jnp.split(hyper_out, 2, axis=-1)

        y_hat_slices: List[Array] = []
        mus, sigmas, liks = [], [], []
        for i, y_slice in enumerate(y_slices):
            support = self._supports(y_hat_slices)
            mu, sigma, mean_in = self._slice_params(i, hyper_mean, hyper_scale,
                                                    support)
            y_hat_a, _ = entropy_model_y(
                y_slice, jnp.concatenate([mu, sigma], axis=-1), is_train=False)
            y_hat_a = y_hat_a * amask
            d_mu, d_sigma = self._spatial_delta(i, y_hat_a)
            mu_c = mu + d_mu * (1.0 - amask)
            sigma_c = sigma + d_sigma * (1.0 - amask)
            params = jnp.concatenate([mu_c, sigma_c], axis=-1)
            y_hat_slice, lik = entropy_model_y(y_slice, params, is_train=False)
            mus.append(mu_c)
            sigmas.append(sigma_c)
            liks.append(lik)
            lrp_in = jnp.concatenate([mean_in, y_hat_slice], axis=-1)
            lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
            y_hat_slices.append(y_hat_slice + lrp)

        return (jnp.concatenate(mus, axis=-1),
                jnp.concatenate(sigmas, axis=-1),
                jnp.concatenate(y_hat_slices, axis=-1),
                jnp.concatenate(liks, axis=-1))

    # ---- per-slice decode methods (2 device programs per slice) ----------

    def decode_slice_base(self, i: int, hyper_mean: Array, hyper_scale: Array,
                          support: Array):
        """(mu, sigma) from channel context only (for anchor decode)."""
        mean_in = jnp.concatenate([hyper_mean, support], axis=-1)
        scale_in = jnp.concatenate([hyper_scale, support], axis=-1)
        return self.mean_transforms[i](mean_in), \
            self.scale_transforms[i](scale_in)

    def decode_slice_spatial(self, i: int, mu: Array, sigma: Array,
                             y_hat_anchor_masked: Array):
        """Combined (mu_c, sigma_c) once anchors are decoded."""
        h, w = mu.shape[1:3]
        amask = anchor_mask(h, w, mu.dtype)[None, :, :, None]
        d_mu, d_sigma = self._spatial_delta(i, y_hat_anchor_masked)
        return mu + d_mu * (1.0 - amask), sigma + d_sigma * (1.0 - amask)

    def decode_slice_lrp(self, i: int, hyper_mean: Array, support: Array,
                         y_hat_slice: Array):
        lrp_in = jnp.concatenate([hyper_mean, support, y_hat_slice], axis=-1)
        lrp = 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_in))
        return y_hat_slice + lrp
