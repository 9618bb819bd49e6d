"""Torch re-implementation of the CompressAI 1.2.4 surface the reference uses.

Written from the CompressAI semantics documented in SURVEY.md §2.13 (and cited
throughout our JAX entropy code); entropy coding delegates to our own C++ rANS
runtime (crdr_tpu/runtime), which is wire-compatible with CompressAI's coder by
contract.  This file exists so the ACTUAL reference source can run for parity
tests — it is test infrastructure, not product code.

API provided (exactly what /root/reference touches):
  EntropyBottleneck(channels)            forward/loss/update/compress/decompress/
                                         quantize/dequantize/_get_medians
  GaussianConditional(scale_table=None, scale_bound=...)
                                         forward/quantize/dequantize/build_indexes/
                                         update_scale_table/compress/decompress
  RansEncoder/RansDecoder               encode_with_indexes/decode_with_indexes/
                                         set_stream/decode_stream
  GDN, get_scale_table, update_registered_buffers, pmf_to_quantized_cdf
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from crdr_tpu.runtime import (
    RansStreamDecoder,
    pmf_to_quantized_cdf,
    rans_decode_with_indexes,
    rans_encode_with_indexes,
)


def pmf_to_quantized_cdf_torch(pmf: torch.Tensor, precision: int = 16):
    out = pmf_to_quantized_cdf(np.asarray(pmf, dtype=np.float32), precision)
    return torch.from_numpy(out.astype(np.int32))


# ---------------------------------------------------------------------------
# LowerBound (compressai.ops.LowerBound): max(x, bound) with pass-through grads
# for x >= bound or negative incoming gradient.
# ---------------------------------------------------------------------------

class _LowerBoundFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, bound):
        ctx.save_for_backward(x, bound)
        return torch.max(x, bound)

    @staticmethod
    def backward(ctx, grad):
        x, bound = ctx.saved_tensors
        passthrough = (x >= bound) | (grad < 0)
        return passthrough.type(grad.dtype) * grad, None


class LowerBound(nn.Module):
    def __init__(self, bound: float):
        super().__init__()
        self.register_buffer("bound", torch.Tensor([float(bound)]))

    def forward(self, x):
        return _LowerBoundFn.apply(x, self.bound)


# ---------------------------------------------------------------------------
# rANS coder bridge (lists in/out like CompressAI's pybind11 interface)
# ---------------------------------------------------------------------------

def _cdf_arrays(cdfs, cdf_lengths, offsets):
    return (np.asarray(cdfs, dtype=np.int32),
            np.asarray(cdf_lengths, dtype=np.int32),
            np.asarray(offsets, dtype=np.int32))


class RansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths,
                            offsets) -> bytes:
        c, l, o = _cdf_arrays(cdfs, cdf_lengths, offsets)
        return rans_encode_with_indexes(
            np.asarray(symbols, dtype=np.int32),
            np.asarray(indexes, dtype=np.int32), c, l, o)


class RansDecoder:
    def __init__(self):
        self._stream_dec: Optional[RansStreamDecoder] = None

    def decode_with_indexes(self, stream: bytes, indexes, cdfs, cdf_lengths,
                            offsets) -> list:
        c, l, o = _cdf_arrays(cdfs, cdf_lengths, offsets)
        out = rans_decode_with_indexes(
            stream, np.asarray(indexes, dtype=np.int32), c, l, o)
        return out.tolist()

    def set_stream(self, stream: bytes) -> None:
        self._stream_dec = RansStreamDecoder(bytes(stream))

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> list:
        assert self._stream_dec is not None, "set_stream first"
        c, l, o = _cdf_arrays(cdfs, cdf_lengths, offsets)
        out = self._stream_dec.decode(np.asarray(indexes, dtype=np.int32),
                                      c, l, o)
        return out.tolist()


# ---------------------------------------------------------------------------
# EntropyModel base: quantize/dequantize + list-interface compress/decompress
# ---------------------------------------------------------------------------

class _EntropyModel(nn.Module):
    def __init__(self, likelihood_bound: float = 1e-9,
                 entropy_coder_precision: int = 16):
        super().__init__()
        self.entropy_coder_precision = int(entropy_coder_precision)
        self.use_likelihood_bound = likelihood_bound > 0
        if self.use_likelihood_bound:
            self.likelihood_lower_bound = LowerBound(likelihood_bound)
        self.register_buffer("_offset", torch.IntTensor())
        self.register_buffer("_quantized_cdf", torch.IntTensor())
        self.register_buffer("_cdf_length", torch.IntTensor())

    def quantize(self, inputs: torch.Tensor, mode: str,
                 means: Optional[torch.Tensor] = None) -> torch.Tensor:
        if mode == "noise":
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs -= means
        outputs = torch.round(outputs)
        if mode == "dequantize":
            if means is not None:
                outputs += means
            return outputs
        assert mode == "symbols", mode
        return outputs.int()

    def dequantize(self, inputs: torch.Tensor,
                   means: Optional[torch.Tensor] = None) -> torch.Tensor:
        if means is not None:
            outputs = inputs.type_as(means)
            outputs += means
        else:
            outputs = inputs.float()
        return outputs

    def compress(self, inputs, indexes, means=None) -> List[bytes]:
        symbols = self.quantize(inputs, "symbols", means)
        strings = []
        enc = RansEncoder()
        for i in range(symbols.size(0)):
            rv = enc.encode_with_indexes(
                symbols[i].reshape(-1).int().tolist(),
                indexes[i].reshape(-1).int().tolist(),
                self._quantized_cdf.tolist(),
                self._cdf_length.reshape(-1).int().tolist(),
                self._offset.reshape(-1).int().tolist())
            strings.append(rv)
        return strings

    def decompress(self, strings, indexes, dtype=torch.float, means=None):
        outputs = self._quantized_cdf.new_empty(indexes.size())
        dec = RansDecoder()
        for i, s in enumerate(strings):
            values = dec.decode_with_indexes(
                s, indexes[i].reshape(-1).int().tolist(),
                self._quantized_cdf.tolist(),
                self._cdf_length.reshape(-1).int().tolist(),
                self._offset.reshape(-1).int().tolist())
            outputs[i] = torch.tensor(
                values, device=outputs.device, dtype=outputs.dtype
            ).reshape(outputs[i].size())
        return self.dequantize(outputs, means)


# ---------------------------------------------------------------------------
# EntropyBottleneck
# ---------------------------------------------------------------------------

class EntropyBottleneck(_EntropyModel):
    def __init__(self, channels: int, *args, tail_mass: float = 1e-9,
                 init_scale: float = 10.0, filters=(3, 3, 3, 3), **kwargs):
        super().__init__(*args, **kwargs)
        self.channels = int(channels)
        self.filters = tuple(int(f) for f in filters)
        self.init_scale = float(init_scale)
        self.tail_mass = float(tail_mass)

        filters_ext = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        C = self.channels
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1.0 / scale / filters_ext[i + 1]))
            matrix = torch.Tensor(C, filters_ext[i + 1], filters_ext[i])
            matrix.data.fill_(init)
            setattr(self, f"_matrix{i}", nn.Parameter(matrix))
            bias = torch.Tensor(C, filters_ext[i + 1], 1)
            nn.init.uniform_(bias, -0.5, 0.5)
            setattr(self, f"_bias{i}", nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(C, filters_ext[i + 1], 1)
                setattr(self, f"_factor{i}", nn.Parameter(factor))

        self.quantiles = nn.Parameter(
            torch.Tensor([[[-self.init_scale, 0.0, self.init_scale]]]
                         ).repeat(C, 1, 1))
        target = math.log(2.0 / self.tail_mass - 1.0)
        self.register_buffer("target", torch.Tensor([-target, 0.0, target]))

    def _get_medians(self) -> torch.Tensor:
        return self.quantiles[:, :, 1:2]

    def _logits_cumulative(self, inputs: torch.Tensor,
                           stop_gradient: bool) -> torch.Tensor:
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = getattr(self, f"_matrix{i}")
            if stop_gradient:
                matrix = matrix.detach()
            logits = torch.matmul(F.softplus(matrix), logits)
            bias = getattr(self, f"_bias{i}")
            if stop_gradient:
                bias = bias.detach()
            logits = logits + bias
            if i < len(self.filters):
                factor = getattr(self, f"_factor{i}")
                if stop_gradient:
                    factor = factor.detach()
                logits = logits + torch.tanh(factor) * torch.tanh(logits)
        return logits

    def _likelihood(self, inputs: torch.Tensor) -> torch.Tensor:
        lower = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(torch.sigmoid(sign * upper) -
                         torch.sigmoid(sign * lower))

    def forward(self, x: torch.Tensor, training: Optional[bool] = None):
        if training is None:
            training = self.training
        # (B, C, ...) -> (C, 1, B*...)
        perm = list(range(x.dim()))
        perm[0], perm[1] = perm[1], perm[0]
        inv_perm = perm  # swapping 0<->1 is its own inverse
        xp = x.permute(*perm).contiguous()
        shape = xp.size()
        values = xp.reshape(shape[0], 1, -1)

        outputs = self.quantize(values, "noise" if training else "dequantize",
                                self._get_medians())
        likelihood = self._likelihood(outputs)
        if self.use_likelihood_bound:
            likelihood = self.likelihood_lower_bound(likelihood)

        outputs = outputs.reshape(shape).permute(*inv_perm).contiguous()
        likelihood = likelihood.reshape(shape).permute(*inv_perm).contiguous()
        return outputs, likelihood

    def loss(self) -> torch.Tensor:
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        return torch.abs(logits - self.target).sum()

    def update(self, force: bool = False) -> bool:
        if self._offset.numel() > 0 and not force:
            return False
        medians = self.quantiles[:, 0, 1]
        minima = torch.clamp(torch.ceil(medians - self.quantiles[:, 0, 0]).int(),
                             min=0)
        maxima = torch.clamp(torch.ceil(self.quantiles[:, 0, 2] - medians).int(),
                             min=0)
        self._offset = -minima
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max().item())

        samples = torch.arange(max_length, dtype=torch.float32)
        samples = samples[None, :] + pmf_start[:, None, None]
        with torch.no_grad():
            lower = self._logits_cumulative(samples - 0.5, stop_gradient=True)
            upper = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -torch.sign(lower + upper)
        pmf = torch.abs(torch.sigmoid(sign * upper) -
                        torch.sigmoid(sign * lower))[:, 0, :]
        tail_mass = (torch.sigmoid(lower[:, 0, :1]) +
                     torch.sigmoid(-upper[:, 0, -1:]))

        cdf = torch.zeros((self.channels, max_length + 2), dtype=torch.int32)
        for i in range(self.channels):
            prob = torch.cat([pmf[i, :pmf_length[i]], tail_mass[i]], dim=0)
            row = pmf_to_quantized_cdf_torch(prob, self.entropy_coder_precision)
            cdf[i, :row.size(0)] = row
        self._quantized_cdf = cdf
        self._cdf_length = pmf_length + 2
        return True

    @staticmethod
    def _build_indexes(size):
        dims = len(size)
        N, C = size[0], size[1]
        view_dims = [1] * dims
        view_dims[1] = -1
        indexes = torch.arange(C).view(*view_dims).int()
        return indexes.repeat(N, 1, *size[2:])

    @staticmethod
    def _extend_ndims(tensor, n):
        return tensor.reshape(-1, *([1] * n)) if n > 0 else tensor.reshape(-1)

    def compress(self, x):
        indexes = self._build_indexes(x.size())
        medians = self._get_medians().detach()
        spatial_dims = x.dim() - 2
        medians = self._extend_ndims(medians, spatial_dims)
        medians = medians.expand(x.size(0), *([-1] * (spatial_dims + 1)))
        return super().compress(x, indexes, medians)

    def decompress(self, strings, size):
        output_size = (len(strings), self._quantized_cdf.size(0), *size)
        indexes = self._build_indexes(output_size).to(
            self._quantized_cdf.device)
        medians = self._extend_ndims(self._get_medians().detach(), len(size))
        medians = medians.expand(len(strings), *([-1] * (len(size) + 1)))
        return super().decompress(strings, indexes, medians.dtype, medians)


# ---------------------------------------------------------------------------
# GaussianConditional
# ---------------------------------------------------------------------------

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(minimum: float = SCALES_MIN, maximum: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> torch.Tensor:
    return torch.exp(torch.linspace(math.log(minimum), math.log(maximum),
                                    levels))


class GaussianConditional(_EntropyModel):
    def __init__(self, scale_table=None, *args, scale_bound: float = 0.11,
                 tail_mass: float = 1e-9, **kwargs):
        super().__init__(*args, **kwargs)
        self.tail_mass = float(tail_mass)
        if scale_bound is None and scale_table:
            scale_bound = float(min(scale_table))
        self.lower_bound_scale = LowerBound(scale_bound)
        self.register_buffer(
            "scale_table",
            self._prepare_scale_table(scale_table) if scale_table
            else torch.Tensor())

    @staticmethod
    def _prepare_scale_table(scale_table):
        return torch.Tensor(tuple(float(s) for s in scale_table))

    @staticmethod
    def _standardized_cumulative(inputs: torch.Tensor) -> torch.Tensor:
        return 0.5 * torch.erfc(-(2 ** -0.5) * inputs)

    @staticmethod
    def _standardized_quantile(quantile: float) -> float:
        from scipy.stats import norm
        return float(norm.ppf(quantile))

    def update_scale_table(self, scale_table, force: bool = False) -> bool:
        if self._offset.numel() > 0 and not force:
            return False
        self.scale_table = self._prepare_scale_table(scale_table)
        self.update()
        return True

    def update(self) -> None:
        multiplier = -self._standardized_quantile(self.tail_mass / 2.0)
        pmf_center = torch.ceil(self.scale_table * multiplier).int()
        pmf_length = 2 * pmf_center + 1
        max_length = int(torch.max(pmf_length).item())

        samples = torch.abs(
            torch.arange(max_length).int() - pmf_center[:, None]).float()
        samples_scale = self.scale_table.unsqueeze(1).float()
        upper = self._standardized_cumulative((0.5 - samples) / samples_scale)
        lower = self._standardized_cumulative((-0.5 - samples) / samples_scale)
        pmf = upper - lower
        tail_mass = 2.0 * lower[:, :1]

        cdf = torch.zeros((len(pmf_length), max_length + 2), dtype=torch.int32)
        for i in range(len(pmf_length)):
            prob = torch.cat([pmf[i, :pmf_length[i]], tail_mass[i]], dim=0)
            row = pmf_to_quantized_cdf_torch(prob, self.entropy_coder_precision)
            cdf[i, :row.size(0)] = row
        self._quantized_cdf = cdf
        self._offset = -pmf_center
        self._cdf_length = pmf_length + 2

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = self.lower_bound_scale(scales)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None, training=None):
        if training is None:
            training = self.training
        outputs = self.quantize(inputs, "noise" if training else "dequantize",
                                means)
        likelihood = self._likelihood(outputs, scales, means)
        if self.use_likelihood_bound:
            likelihood = self.likelihood_lower_bound(likelihood)
        return outputs, likelihood

    def build_indexes(self, scales: torch.Tensor) -> torch.Tensor:
        scales = self.lower_bound_scale(scales)
        indexes = scales.new_full(scales.size(),
                                  len(self.scale_table) - 1).int()
        for s in self.scale_table[:-1]:
            indexes -= (scales <= s).int()
        return indexes


# ---------------------------------------------------------------------------
# GDN (only the alt Balle18/Cheng20 nets use it; flagship CRDR does not)
# ---------------------------------------------------------------------------

class _NonNegativeParametrizer(nn.Module):
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        super().__init__()
        self.minimum = float(minimum)
        self.register_buffer("pedestal",
                             torch.Tensor([reparam_offset ** 2]))
        bound = (self.minimum + reparam_offset ** 2) ** 0.5
        self.lower_bound = LowerBound(bound)

    def init(self, x):
        return torch.sqrt(torch.max(x + self.pedestal, self.pedestal))

    def forward(self, x):
        return self.lower_bound(x) ** 2 - self.pedestal


class GDN(nn.Module):
    def __init__(self, in_channels: int, inverse: bool = False,
                 beta_min: float = 1e-6, gamma_init: float = 0.1):
        super().__init__()
        self.inverse = bool(inverse)
        self.beta_reparam = _NonNegativeParametrizer(minimum=beta_min)
        beta = self.beta_reparam.init(torch.ones(in_channels))
        self.beta = nn.Parameter(beta)
        self.gamma_reparam = _NonNegativeParametrizer()
        gamma = self.gamma_reparam.init(
            gamma_init * torch.eye(in_channels))
        self.gamma = nn.Parameter(gamma)

    def forward(self, x):
        _, C, _, _ = x.size()
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma).reshape(C, C, 1, 1)
        norm = F.conv2d(x ** 2, gamma, beta)
        norm = torch.sqrt(norm) if not self.inverse else torch.rsqrt(norm)
        return x * norm


# ---------------------------------------------------------------------------
# compressai.models.utils.update_registered_buffers
# ---------------------------------------------------------------------------

def _update_registered_buffer(module, buffer_name, state_dict_key, state_dict,
                              policy, dtype):
    new_size = state_dict[state_dict_key].size()
    registered_buf = getattr(module, buffer_name)
    if policy in ("resize_if_empty", "resize"):
        if policy == "resize_if_empty" and registered_buf.numel() > 0:
            return
        registered_buf.resize_(new_size)
    elif policy == "register":
        module.register_buffer(buffer_name,
                               torch.empty(new_size, dtype=dtype).fill_(0))
    else:
        raise ValueError(f"Invalid policy '{policy}'")


def update_registered_buffers(module, module_name, buffer_names, state_dict,
                              policy: str = "resize_if_empty",
                              dtype=torch.int):
    for buffer_name in buffer_names:
        _update_registered_buffer(module, buffer_name,
                                  f"{module_name}.{buffer_name}", state_dict,
                                  policy, dtype)
