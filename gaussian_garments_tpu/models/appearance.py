"""Fourier positional embedder + small appearance nets.

Reference ``scene/appearance.py``: the ``Embedder``/``get_embedder`` pair
(:6-55) is used by AvatarNet's constructor; ``AppearanceNet`` and ``ConvUNet``
(:58-179) are defined but never exercised by the stage scripts — provided for
API parity.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Embedder:
    """Fourier feature embedding: [x, sin(2^k x), cos(2^k x), ...]."""

    def __init__(self, input_dim: int, num_freqs: int = 10, include_input: bool = True,
                 log_sampling: bool = True):
        self.input_dim = input_dim
        self.include_input = include_input
        if log_sampling:
            self.freq_bands = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs)
        else:
            self.freq_bands = jnp.linspace(2.0**0.0, 2.0 ** (num_freqs - 1), num_freqs)
        self.out_dim = input_dim * (int(include_input) + 2 * num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = [x] if self.include_input else []
        for f in self.freq_bands:
            outs.append(jnp.sin(x * f))
            outs.append(jnp.cos(x * f))
        return jnp.concatenate(outs, axis=-1)


def get_embedder(input_dim: int, num_freqs: int = 10):
    e = Embedder(input_dim, num_freqs)
    return e, e.out_dim


class AppearanceNet(nn.Module):
    """MLP head (reference :58-96; unused by the pipeline, kept for parity)."""

    out_dim: int = 3
    hidden: Sequence[int] = (256, 256, 256)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class ConvUNet(nn.Module):
    """Small conv UNet (reference :99-179; defined-but-unused, kept for
    parity). NCHW in/out."""

    out_ch: int = 3
    base: int = 32

    @nn.compact
    def __call__(self, x):
        def conv(x, c, stride=1):
            x = jnp.transpose(x, (0, 2, 3, 1))
            x = nn.Conv(c, (3, 3), strides=(stride, stride))(x)
            return jnp.transpose(x, (0, 3, 1, 2))

        e1 = nn.relu(conv(x, self.base))
        e2 = nn.relu(conv(e1, self.base * 2, stride=2))
        e3 = nn.relu(conv(e2, self.base * 4, stride=2))
        d2 = jax.image.resize(e3, (*e3.shape[:2], *e2.shape[2:]), "nearest")
        d2 = nn.relu(conv(jnp.concatenate([d2, e2], 1), self.base * 2))
        d1 = jax.image.resize(d2, (*d2.shape[:2], *e1.shape[2:]), "nearest")
        d1 = nn.relu(conv(jnp.concatenate([d1, e1], 1), self.base))
        return conv(d1, self.out_ch)

