"""Fully-factorized learned entropy model ("entropy bottleneck") for z.

Re-implements the CompressAI ``EntropyBottleneck`` semantics exactly (the reference
subclasses it at src/models/subnet/entropy_model/entropy_bottleneck.py:13-30):

* per-channel monotone density modeled by a chain of softplus-matrices, biases and
  tanh factors over ``filters=(3, 3, 3, 3)``;
* learnable ``quantiles`` (C, 1, 3) whose aux loss targets tail mass 1e-9;
* training forward: additive U(-0.5, 0.5) noise for the likelihood; the STE variant
  returns ``ste_round(x - median) + median`` as the decoder input;
* eval forward: hard rounding around the median;
* ``update()`` builds integer CDF tables (16-bit) for the host rANS coder.

Likelihoods are computed on device (JAX); CDF-table construction and entropy coding
are host-side (numpy + C++).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ENTROPYMODEL_REGISTRY
from .ops import lower_bound, ste_round

Array = jax.Array

LIKELIHOOD_BOUND = 1e-9


def _logits_cumulative(params: dict, x: Array, nfilters: int,
                       stop_gradient: bool) -> Array:
    """c(x) logits for inputs shaped (C, 1, N)."""
    logits = x
    for i in range(nfilters + 1):
        m = params[f"matrices_{i}"]
        b = params[f"biases_{i}"]
        if stop_gradient:
            m = jax.lax.stop_gradient(m)
            b = jax.lax.stop_gradient(b)
        logits = jnp.einsum("coi,cin->con", jax.nn.softplus(m), logits) + b
        if i < nfilters:
            f = params[f"factors_{i}"]
            if stop_gradient:
                f = jax.lax.stop_gradient(f)
            logits = logits + jnp.tanh(f) * jnp.tanh(logits)
    return logits


def _likelihood_from_logits(lower: Array, upper: Array) -> Array:
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))


@ENTROPYMODEL_REGISTRY.register()
class EntropyBottleneck(nn.Module):
    """Noise-quantized factorized bottleneck (NHWC inputs)."""

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        filters_ext = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        C = self.channels
        for i in range(len(self.filters) + 1):
            f_in, f_out = filters_ext[i], filters_ext[i + 1]
            init_val = math.log(math.expm1(1.0 / scale / f_out))
            setattr(self, f"matrices_{i}", self.param(
                f"matrices_{i}",
                lambda k, s, v=init_val: jnp.full(s, v, jnp.float32),
                (C, f_out, f_in)))
            setattr(self, f"biases_{i}", self.param(
                f"biases_{i}",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                (C, f_out, 1)))
            if i < len(self.filters):
                setattr(self, f"factors_{i}", self.param(
                    f"factors_{i}",
                    lambda k, s: jnp.zeros(s, jnp.float32),
                    (C, f_out, 1)))
        self.quantiles = self.param(
            "quantiles",
            lambda k, s: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (C, 1, 1)),
            (C, 1, 3))

    def _params_dict(self) -> dict:
        d = {}
        for i in range(len(self.filters) + 1):
            d[f"matrices_{i}"] = getattr(self, f"matrices_{i}")
            d[f"biases_{i}"] = getattr(self, f"biases_{i}")
            if i < len(self.filters):
                d[f"factors_{i}"] = getattr(self, f"factors_{i}")
        return d

    def medians(self) -> Array:
        """Per-channel median, gradient-stopped (shape [C])."""
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def likelihood(self, x_chn: Array) -> Array:
        """Likelihood of values shaped (C, 1, N); always computed in f32."""
        x_chn = jnp.asarray(x_chn, jnp.float32)
        p = self._params_dict()
        nf = len(self.filters)
        lower = _logits_cumulative(p, x_chn - 0.5, nf, stop_gradient=False)
        upper = _logits_cumulative(p, x_chn + 0.5, nf, stop_gradient=False)
        lik = _likelihood_from_logits(lower, upper)
        # LowerBound gradient rule, not a plain max — see gaussian_likelihood
        return lower_bound(lik, LIKELIHOOD_BOUND)

    def __call__(self, x: Array, is_train: bool = True,
                 rng: Optional[Array] = None) -> Tuple[Array, Array]:
        """x: NHWC. Returns (x_hat, likelihood) both NHWC."""
        n, h, w, c = x.shape
        assert c == self.channels
        med = self.medians()
        # NHWC -> (C, 1, N*H*W)
        x_chn = x.transpose(3, 0, 1, 2).reshape(c, 1, -1)
        if is_train:
            assert rng is not None, "training forward needs an rng for noise"
            noisy = x_chn + jax.random.uniform(rng, x_chn.shape, x.dtype, -0.5, 0.5)
            lik = self.likelihood(noisy)
            outputs = noisy
        else:
            rounded = jnp.round(x_chn - med[:, None, None]) + med[:, None, None]
            lik = self.likelihood(rounded)
            outputs = rounded
        x_hat = outputs.reshape(c, n, h, w).transpose(1, 2, 3, 0)
        likelihood = lik.reshape(c, n, h, w).transpose(1, 2, 3, 0)
        return x_hat, likelihood

    def loss(self) -> Array:
        """Aux loss pushing quantiles to the target tail mass."""
        target = math.log(2.0 / self.tail_mass - 1.0)
        tgt = jnp.array([-target, 0.0, target], jnp.float32)
        logits = _logits_cumulative(self._params_dict(), self.quantiles,
                                    len(self.filters), stop_gradient=True)
        return jnp.abs(logits - tgt[None, None, :]).sum()


@ENTROPYMODEL_REGISTRY.register()
class SteEntropyBottleneck(EntropyBottleneck):
    """Noise for the likelihood, straight-through rounding for the output
    (reference entropy_bottleneck.py:19-30)."""

    def __call__(self, x: Array, is_train: bool = True,
                 rng: Optional[Array] = None) -> Tuple[Array, Array]:
        if not is_train:
            return super().__call__(x, is_train=False)
        _, likelihood = super().__call__(x, is_train=True, rng=rng)
        med = self.medians()[None, None, None, :]
        x_hat = ste_round(x - med) + med
        return x_hat, likelihood


# ---------------------------------------------------------------------------
# Host-side codec state (CDF tables + rANS calls)
# ---------------------------------------------------------------------------

class EntropyBottleneckCodec:
    """Builds integer CDF tables from trained params and entropy-codes z.

    Mirrors CompressAI ``EntropyBottleneck.update`` / ``compress`` /
    ``decompress``.  Symbols are serialized in channel-major (C, H, W) order to
    preserve stream-layout parity with the reference.
    """

    def __init__(self, params: dict, filters: Tuple[int, ...] = (3, 3, 3, 3),
                 tail_mass: float = 1e-9):
        # params: the flax param subtree of the (Ste)EntropyBottleneck module
        self.params = {k: np.asarray(v) for k, v in params.items()}
        self.filters = tuple(filters)
        self.tail_mass = tail_mass
        self.quantized_cdf: Optional[np.ndarray] = None
        self.cdf_length: Optional[np.ndarray] = None
        self.offset: Optional[np.ndarray] = None

    @property
    def channels(self) -> int:
        return self.params["quantiles"].shape[0]

    def medians(self) -> np.ndarray:
        return self.params["quantiles"][:, 0, 1]

    def update(self, force: bool = False) -> bool:
        if self.quantized_cdf is not None and not force:
            return False
        from ..runtime import pmf_to_quantized_cdf

        q = self.params["quantiles"]
        medians = q[:, 0, 1]
        minima = np.maximum(np.ceil(medians - q[:, 0, 0]).astype(np.int32), 0)
        maxima = np.maximum(np.ceil(q[:, 0, 2] - medians).astype(np.int32), 0)
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())

        pmf, tail = self._pmf(pmf_start, max_length)

        C = self.channels
        cdf = np.zeros((C, max_length + 2), dtype=np.int32)
        for c in range(C):
            p = np.concatenate([pmf[c, :pmf_length[c]], [tail[c]]])
            row = pmf_to_quantized_cdf(p.astype(np.float32), 16)
            cdf[c, :len(row)] = row
        self.quantized_cdf = cdf
        self.cdf_length = (pmf_length + 2).astype(np.int32)
        self.offset = (-minima).astype(np.int32)
        return True

    def _pmf(self, pmf_start: np.ndarray, max_length: int):
        """PMF rows from the logits chain.  CompressAI evaluates this in torch
        float32 (EntropyBottleneck.update); quantized CDFs are ulp-sensitive,
        so reference-stream byte parity requires the same arithmetic — torch
        when importable, the JAX f32 program otherwise
        (tests/test_reference_source_parity.py::test_cdf_table_parity)."""
        nf = len(self.filters)
        try:
            import torch
        except ImportError:
            torch = None

        if torch is not None:
            with torch.no_grad():
                samples = torch.arange(max_length, dtype=torch.float32)
                samples = samples[None, None, :] + torch.from_numpy(
                    np.asarray(pmf_start, np.float32))[:, None, None]

                def logits(x):
                    out = x
                    for i in range(nf + 1):
                        m = torch.from_numpy(np.array(
                            self.params[f"matrices_{i}"], np.float32))
                        out = torch.matmul(
                            torch.nn.functional.softplus(m), out)
                        out = out + torch.from_numpy(np.array(
                            self.params[f"biases_{i}"], np.float32))
                        if i < nf:
                            f = torch.from_numpy(np.array(
                                self.params[f"factors_{i}"], np.float32))
                            out = out + torch.tanh(f) * torch.tanh(out)
                    return out

                lower = logits(samples - 0.5)
                upper = logits(samples + 0.5)
                sign = -torch.sign(lower + upper)
                pmf = torch.abs(torch.sigmoid(sign * upper) -
                                torch.sigmoid(sign * lower))[:, 0, :].numpy()
                tail = (torch.sigmoid(lower[:, 0, 0]) +
                        torch.sigmoid(-upper[:, 0, -1])).numpy()
            return pmf, tail

        samples = np.arange(max_length, dtype=np.float32)[None, None, :] \
            + np.asarray(pmf_start, np.float32)[:, None, None]
        # host-side table building: run the tiny logits program on the CPU
        # backend — compiling it on an accelerator wastes minutes of remote
        # compile for microseconds of math
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        import contextlib
        ctx = jax.default_device(cpu) if cpu is not None \
            else contextlib.nullcontext()
        with ctx:
            jparams = {k: jnp.asarray(v) for k, v in self.params.items()}
            lower = np.asarray(_logits_cumulative(
                jparams, jnp.asarray(samples - 0.5), nf, True))
            upper = np.asarray(_logits_cumulative(
                jparams, jnp.asarray(samples + 0.5), nf, True))
        sign = -np.sign(lower + upper)
        pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]
        tail = _sigmoid(lower[:, 0, 0]) + _sigmoid(-upper[:, 0, -1])
        return pmf, tail

    def load_tables(self, quantized_cdf, cdf_length, offset) -> None:
        """Install CDF tables restored from a checkpoint (buffer import)."""
        self.quantized_cdf = np.asarray(quantized_cdf, np.int32)
        self.cdf_length = np.asarray(cdf_length, np.int32).reshape(-1)
        self.offset = np.asarray(offset, np.int32).reshape(-1)

    def compress(self, z: np.ndarray) -> list:
        """z: NHWC float. Returns one bytestring per batch element."""
        med = self.medians()
        symbols = np.round(z - med[None, None, None, :]).astype(np.int32)
        return self.compress_symbols(symbols)

    def compress_symbols(self, symbols: np.ndarray) -> list:
        """Entropy-code pre-rounded centered symbols (int NHWC) — the fused
        device encode already subtracts the medians and rounds on device."""
        from ..runtime import rans_encode_with_indexes

        assert self.quantized_cdf is not None, "call update() first"
        n, h, w, c = symbols.shape
        # channel-major serialization (CompressAI NCHW layout parity)
        symbols = symbols.astype(np.int32).transpose(0, 3, 1, 2).reshape(n, -1)
        indexes = np.broadcast_to(
            np.arange(c, dtype=np.int32)[:, None], (c, h * w)).reshape(-1)
        return [
            rans_encode_with_indexes(symbols[i], indexes, self.quantized_cdf,
                                     self.cdf_length, self.offset)
            for i in range(n)
        ]

    def decompress(self, strings: list, size: Tuple[int, int]) -> np.ndarray:
        """Returns integer symbols (centered) as float NHWC; add medians via
        :meth:`dequantize` (reference decodes symbols then dequantizes:
        hyperprior_charm_model.py:137-138)."""
        from ..runtime import rans_decode_with_indexes

        assert self.quantized_cdf is not None
        h, w = size
        c = self.channels
        n = len(strings)
        indexes = np.broadcast_to(
            np.arange(c, dtype=np.int32)[:, None], (c, h * w)).reshape(-1)
        out = np.zeros((n, c, h, w), dtype=np.float32)
        for i, s in enumerate(strings):
            sym = rans_decode_with_indexes(s, indexes, self.quantized_cdf,
                                           self.cdf_length, self.offset)
            out[i] = sym.reshape(c, h, w).astype(np.float32)
        return out.transpose(0, 2, 3, 1)

    def dequantize(self, symbols: np.ndarray) -> np.ndarray:
        return symbols + self.medians()[None, None, None, :].astype(np.float32)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))
