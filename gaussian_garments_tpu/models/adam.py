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


class TreeAdam(NamedTuple):
    step: jnp.ndarray
    mu: object
    nu: object


def tree_adam_init(params) -> TreeAdam:
    import jax
    return TreeAdam(jnp.zeros((), jnp.int32),
                    jax.tree.map(jnp.zeros_like, params),
                    jax.tree.map(jnp.zeros_like, params))


def tree_adam_step(params, grads, state: TreeAdam, lr_tree,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """Adam over an arbitrary pytree with a per-leaf learning-rate pytree
    (scalars; same structure or a prefix thereof)."""
    import jax
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    new_p = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, mu, nu, lr_tree,
    )
    return new_p, TreeAdam(step, mu, nu)
