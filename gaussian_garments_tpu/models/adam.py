"""Per-tensor Adam (torch.optim.Adam(eps=1e-15) semantics) for generic pytrees.

Owning the optimizer keeps densification state surgery a plain array edit
(see models/gaussian.py) and lets learning rates be traced scalars.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TensorAdam(NamedTuple):
    step: jnp.ndarray  # scalar int32
    mu: jnp.ndarray
    nu: jnp.ndarray


def tensor_adam_init(p: jnp.ndarray) -> TensorAdam:
    return TensorAdam(jnp.zeros((), jnp.int32), jnp.zeros_like(p), jnp.zeros_like(p))


def tensor_adam_step(
    p: jnp.ndarray,
    g: jnp.ndarray,
    state: TensorAdam,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    step = state.step + 1
    mu = b1 * state.mu + (1 - b1) * g
    nu = b2 * state.nu + (1 - b2) * g * g
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    new_p = p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    return new_p, TensorAdam(step, mu, nu)
