"""Distributed layer: device mesh + camera/frame data parallelism.

The reference is a single-GPU pipeline with no distributed framework at all
(SURVEY.md §2.6). This module is the *new, first-class* TPU equivalent:

- one ``jax.sharding.Mesh`` with a ``"data"`` axis over all chips;
- stage 2 shards the per-iteration **camera batch** across chips (the
  reference samples 1 random camera/iter, ``s2_registration.py:241-243``; we
  render k cameras, one shard per chip) and all-reduces gradients over ICI
  with ``jax.lax.psum`` inside ``shard_map``;
- stage 3 shards (frame, camera) items the same way;
- parameters (splats, mesh vertices, StyleUNet) are small → replicated.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D ("data",) mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (camera/item) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_step(step_fn, mesh: Mesh, *, in_specs, out_specs):
    """``jax.jit(shard_map(step_fn))`` with axis-name shorthand specs.

    Each entry of ``in_specs``/``out_specs`` is ``None`` (replicated) or an
    axis name like ``"data"`` (shard that argument's leading axis). The
    step_fn must pmean/psum its own cross-shard quantities over the axis —
    both training steps do (``training/s2.py``, ``training/s3.py``).
    Used by both drivers and ``__graft_entry__.dryrun_multichip``."""
    from jax import shard_map

    to_p = lambda s: s if isinstance(s, P) else (P() if s is None else P(s))
    return jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=tuple(to_p(s) for s in in_specs),
        out_specs=tuple(to_p(s) for s in out_specs),
        check_vma=False))
