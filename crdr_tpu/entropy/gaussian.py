"""Conditional Gaussian entropy model for y (mean-scale, with STE variant).

Semantics match CompressAI ``GaussianConditional`` (subclassed by the reference at
src/models/subnet/entropy_model/gaussian_conditional.py:10-24 and
ste_gaussian_conditional.py:10-27):

* likelihood = Phi((0.5 - |y - mu|) / sigma) - Phi((-0.5 - |y - mu|) / sigma)
  with sigma lower-bounded at ``scale_bound`` (0.11 in all CRDR configs) and the
  likelihood floored at 1e-9;
* training: additive-uniform-noise likelihood; decoder input is
  ``ste_round(y - mu) + mu`` (STE variant);
* eval: hard rounding around the mean;
* coding uses a 64-entry log-spaced scale table (0.11 .. 256) and
  ``build_indexes = searchsorted(table, sigma)``.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ENTROPYMODEL_REGISTRY
from .ops import lower_bound, standardized_cumulative, ste_round

Array = jax.Array

LIKELIHOOD_BOUND = 1e-9
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(minimum: float = SCALES_MIN, maximum: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """exp(linspace(log min, log max, levels)) — CompressAI's default table.

    CompressAI evaluates this in torch float32 (compressai/models/get_scale_table);
    bit-exact .bin parity with reference streams needs the EXACT same f32 values
    (a 1-ulp table drift can flip a build_indexes boundary), so compute through
    torch when it is importable and fall back to the f64 numpy approximation
    otherwise (verified by tests/test_reference_source_parity.py).
    """
    try:
        import torch
        return torch.exp(torch.linspace(math.log(minimum), math.log(maximum),
                                        levels)).numpy()
    except ImportError:
        return np.exp(np.linspace(math.log(minimum), math.log(maximum),
                                  levels))


def gaussian_likelihood(values: Array, scales: Array,
                        scale_bound: float) -> Array:
    # rate math always in f32: bf16 erfc destroys likelihood precision
    values = jnp.asarray(values, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    scales = lower_bound(scales, scale_bound)
    values = jnp.abs(values)
    upper = standardized_cumulative((0.5 - values) / scales)
    lower = standardized_cumulative((-0.5 - values) / scales)
    # the floor must use the LowerBound gradient rule (CompressAI
    # entropy_models.py likelihood_lower_bound): a plain max() zeroes the
    # rate gradient for floored symbols, making a transient likelihood
    # collapse an absorbing state the model cannot train out of
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


@ENTROPYMODEL_REGISTRY.register()
class GaussianMeanScaleConditional(nn.Module):
    """params = concat([mean, scale], channel axis); NHWC."""

    scale_bound: float = SCALES_MIN

    def split_params(self, params: Array) -> Tuple[Array, Array]:
        return jnp.split(params, 2, axis=-1)

    @nn.compact
    def __call__(self, y: Array, params: Array, is_train: bool = True,
                 rng: Optional[Array] = None) -> Tuple[Array, Array]:
        mean, scale = self.split_params(params)
        if is_train:
            assert rng is not None, "training forward needs an rng for noise"
            noisy = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
            likelihood = gaussian_likelihood(noisy - mean, scale, self.scale_bound)
            y_hat = noisy
        else:
            y_hat = jnp.round(y - mean) + mean
            likelihood = gaussian_likelihood(y_hat - mean, scale, self.scale_bound)
        return y_hat, likelihood


@ENTROPYMODEL_REGISTRY.register()
class GaussianScaleConditional(nn.Module):
    """Scale-only conditional (params = scales), for Balle18-style models."""

    scale_bound: float = SCALES_MIN

    @nn.compact
    def __call__(self, y: Array, params: Array, is_train: bool = True,
                 rng: Optional[Array] = None) -> Tuple[Array, Array]:
        scale = params
        if is_train:
            assert rng is not None
            noisy = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
            return noisy, gaussian_likelihood(noisy, scale, self.scale_bound)
        y_hat = jnp.round(y)
        return y_hat, gaussian_likelihood(y_hat, scale, self.scale_bound)


@ENTROPYMODEL_REGISTRY.register()
class SteGaussianMeanScaleConditional(GaussianMeanScaleConditional):
    """Noise likelihood + straight-through-rounded output
    (reference ste_gaussian_conditional.py:10-27)."""

    entropy_quant_type: str = "noise"

    @nn.compact
    def __call__(self, y: Array, params: Array, is_train: bool = True,
                 rng: Optional[Array] = None) -> Tuple[Array, Array]:
        assert self.entropy_quant_type == "noise"
        mean, scale = self.split_params(params)
        if is_train:
            assert rng is not None
            noisy = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
            likelihood = gaussian_likelihood(noisy - mean, scale, self.scale_bound)
            y_hat = ste_round(y - mean) + mean
        else:
            y_hat = jnp.round(y - mean) + mean
            likelihood = gaussian_likelihood(y_hat - mean, scale, self.scale_bound)
        return y_hat, likelihood


def build_indexes(scales: Array, scale_table: Array,
                  scale_bound: float) -> Array:
    """Index of the smallest table entry >= scale (CompressAI build_indexes);
    scales above the table max are clamped to the last entry."""
    scales = jnp.maximum(scales, scale_bound)
    idx = jnp.searchsorted(scale_table, scales, side="left")
    return jnp.minimum(idx, len(scale_table) - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side codec state
# ---------------------------------------------------------------------------

class GaussianConditionalCodec:
    """CDF tables over the scale table + rANS coding for y.

    Mirrors CompressAI ``GaussianConditional.update`` / ``compress`` /
    ``decompress``; also exposes the raw streaming-decoder hooks used by the
    Charm serial decode.
    """

    def __init__(self, scale_bound: float = SCALES_MIN, tail_mass: float = 1e-9):
        self.scale_bound = scale_bound
        self.tail_mass = tail_mass
        self.scale_table: Optional[np.ndarray] = None
        self.quantized_cdf: Optional[np.ndarray] = None
        self.cdf_length: Optional[np.ndarray] = None
        self.offset: Optional[np.ndarray] = None

    def update_scale_table(self, scale_table: Optional[np.ndarray] = None,
                           force: bool = False) -> bool:
        if self.quantized_cdf is not None and not force:
            return False
        if scale_table is None:
            scale_table = get_scale_table()
        self.scale_table = np.asarray(scale_table, np.float64)
        self._build_tables()
        return True

    def _build_tables(self) -> None:
        from scipy.stats import norm

        from ..runtime import pmf_to_quantized_cdf

        multiplier = -float(norm.ppf(self.tail_mass / 2.0))
        pmf_center = np.ceil(
            np.asarray(self.scale_table, np.float32) * np.float32(multiplier)
        ).astype(np.int32)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        pmf, tail = self._pmf(pmf_center, max_length)

        L = len(self.scale_table)
        cdf = np.zeros((L, max_length + 2), dtype=np.int32)
        for i in range(L):
            p = np.concatenate([pmf[i, :pmf_length[i]], tail[i]])
            row = pmf_to_quantized_cdf(p.astype(np.float32), 16)
            cdf[i, :len(row)] = row
        self.quantized_cdf = cdf
        self.cdf_length = (pmf_length + 2).astype(np.int32)
        self.offset = (-pmf_center).astype(np.int32)

    def _pmf(self, pmf_center: np.ndarray, max_length: int):
        """Per-scale PMF rows.  CompressAI evaluates these in torch float32
        (GaussianConditional.update); the quantized CDFs are sensitive to the
        last ulp of the pmf, so reference-stream byte parity requires the same
        arithmetic — use torch when importable, f64 numpy otherwise
        (tests/test_reference_source_parity.py::test_cdf_table_parity)."""
        try:
            import torch
        except ImportError:
            samples = np.abs(np.arange(max_length, dtype=np.float64)[None, :]
                             - pmf_center[:, None])
            ss = np.asarray(self.scale_table, np.float64)[:, None]
            upper = _phi((0.5 - samples) / ss)
            lower = _phi((-0.5 - samples) / ss)
            return upper - lower, 2.0 * lower[:, :1]

        with torch.no_grad():
            center = torch.from_numpy(pmf_center.astype(np.int32))
            samples = torch.abs(
                torch.arange(max_length).int() - center[:, None]).float()
            ss = torch.from_numpy(
                np.asarray(self.scale_table, np.float32)).unsqueeze(1)
            const = -(2 ** -0.5)
            upper = 0.5 * torch.erfc(const * ((0.5 - samples) / ss))
            lower = 0.5 * torch.erfc(const * ((-0.5 - samples) / ss))
            pmf = (upper - lower).numpy()
            tail = (2.0 * lower[:, :1]).numpy()
        return pmf, tail

    def load_tables(self, quantized_cdf, cdf_length, offset,
                    scale_table=None) -> None:
        self.quantized_cdf = np.asarray(quantized_cdf, np.int32)
        self.cdf_length = np.asarray(cdf_length, np.int32).reshape(-1)
        self.offset = np.asarray(offset, np.int32).reshape(-1)
        if scale_table is not None:
            self.scale_table = np.asarray(scale_table, np.float64)

    def build_indexes(self, scales: np.ndarray) -> np.ndarray:
        scales = np.maximum(scales, self.scale_bound)
        idx = np.searchsorted(self.scale_table, scales, side="left")
        return np.minimum(idx, len(self.scale_table) - 1).astype(np.int32)

    def compress(self, y: np.ndarray, indexes: np.ndarray,
                 means: Optional[np.ndarray] = None) -> List[bytes]:
        """y, indexes, means: NHWC. One bytestring per batch element."""
        from ..runtime import rans_encode_with_indexes

        assert self.quantized_cdf is not None, "call update_scale_table() first"
        vals = y - means if means is not None else y
        symbols = np.round(vals).astype(np.int32)
        n = symbols.shape[0]
        # channel-major serialization parity with the reference streams
        sym_flat = symbols.transpose(0, 3, 1, 2).reshape(n, -1)
        idx_flat = indexes.transpose(0, 3, 1, 2).reshape(n, -1)
        return [
            rans_encode_with_indexes(sym_flat[i], idx_flat[i].astype(np.int32),
                                     self.quantized_cdf, self.cdf_length,
                                     self.offset)
            for i in range(n)
        ]

    def decompress(self, strings: List[bytes], indexes: np.ndarray,
                   means: Optional[np.ndarray] = None) -> np.ndarray:
        from ..runtime import rans_decode_with_indexes

        assert self.quantized_cdf is not None
        n, h, w, c = indexes.shape
        out = np.zeros((n, c, h * w), dtype=np.float32)
        idx_flat = indexes.transpose(0, 3, 1, 2).reshape(n, -1)
        for i, s in enumerate(strings):
            sym = rans_decode_with_indexes(s, idx_flat[i].astype(np.int32),
                                           self.quantized_cdf, self.cdf_length,
                                           self.offset)
            out[i] = sym.reshape(c, h * w).astype(np.float32)
        out = out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        if means is not None:
            out = out + means
        return out


def _phi(x: np.ndarray) -> np.ndarray:
    from scipy.special import erfc

    return 0.5 * erfc(-x / math.sqrt(2.0))
