"""Encoder/decoder interface: static attributes used by codec setup
(reference base_autoencoder.py:5-20)."""

from __future__ import annotations

from flax import linen as nn


class BaseEncoder(nn.Module):
    num_downscale: int = 4
    latent_ch: int = 320


class BaseDecoder(nn.Module):
    pass
