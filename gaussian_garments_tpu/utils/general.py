"""General helpers mirroring the reference ``utils/general_utils.py`` /
``utils/system_utils.py`` (minus torch)."""
from __future__ import annotations

import os
from typing import Callable

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def get_expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> Callable:
    """JaxNeRF-style log-linear LR decay; reference ``general_utils.py:39-72``.

    Returned callable works on both Python ints and traced jnp arrays, so it
    can live inside a jitted optimizer step.
    """

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return helper


def knn_numpy(pts: np.ndarray, num_knn: int):
    """(sq_dists, indices) of each point's k nearest neighbors, excluding
    itself. Drop-in for the reference's open3d ``o3d_knn``
    (``utils/general_utils.py:145-155``). Uses scipy cKDTree on host."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.ascontiguousarray(pts, np.float64))
    dists, idx = tree.query(pts, k=num_knn + 1)
    return (dists[:, 1:] ** 2), idx[:, 1:]


def safe_state(silent: bool = False, seed: int = 0):
    """Seed numpy/python RNGs and optionally silence stdout (reference
    ``utils/general_utils.py:122-143`` minus the torch/cuda parts; JAX
    randomness is explicit-key so no global seeding applies)."""
    import random
    import sys

    if silent:
        class _Quiet:
            def write(self, _):
                pass

            def flush(self):
                pass

        sys.stdout = _Quiet()
    random.seed(seed)
    np.random.seed(seed)


def mkdir_p(folder_path):
    os.makedirs(folder_path, exist_ok=True)


def search_for_max_iteration(folder):
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)


def search_for_min_frame(folder):
    """Smallest frame index among frame_%05d-style entries (reference
    utils/system_utils.py searchForMinFrame)."""
    frames = [int(f.split("_")[-1].split(".")[0]) for f in os.listdir(folder)]
    return min(frames)
