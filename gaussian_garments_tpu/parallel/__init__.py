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


def psum_mean_grads(grads, axis_name: str = "data"):
    """All-reduce-mean a gradient pytree over the data axis (inside shard_map)."""
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)


def data_parallel_step(step_fn, mesh: Mesh, *, batched_argnums=(1,)):
    """Wrap a (params, batch, ...) -> (params, aux) step with shard_map:
    ``batch`` leading axes shard over "data"; everything else replicates;
    the step_fn must psum/pmean its own cross-shard quantities (use
    ``psum_mean_grads``)."""
    from jax import shard_map

    in_specs = tuple(
        P("data") if i in batched_argnums else P() for i in range(step_fn.__code__.co_argcount)
    )
    return shard_map(step_fn, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False)
