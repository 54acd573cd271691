"""Checkpoint / resume for stage 3 and generic pytrees.

Reference ``AvatarNet.save_ckpt/load_ckpt`` (scene/avatar_net.py:89-131):
``ckpt/net.pt`` (epoch, active_sh_degree, state_dict) + ``ckpt/optm.pt`` +
``info.txt``, with auto-resume when ``ckpt/net.pt`` exists (:52-53). We keep
the same directory layout with pickled numpy pytrees (``net.pkl``/
``optm.pkl``) — framework-neutral and orbax-free so checkpoints remain
readable without JAX.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_s3_ckpt(model_path, state, epoch: int, active_sh_degree: int = 3,
                 save_optm: bool = True, name: str = "ckpt") -> None:
    """state: training.s3.S3State."""
    path = Path(model_path) / name
    os.makedirs(path, exist_ok=True)
    with open(path / "info.txt", "w") as f:
        f.write(f"Epoch {epoch}\n")
    net = {
        "epoch": epoch,
        "activate_sh_degree": active_sh_degree,
        "net_params": _to_numpy(state.net_params),
        "net_buffers": _to_numpy(state.net_buffers),
        "splats": _to_numpy(state.splats),
    }
    with open(path / "net.pkl", "wb") as f:
        pickle.dump(net, f)
    if save_optm:
        with open(path / "optm.pkl", "wb") as f:
            pickle.dump({"net_adam": _to_numpy(state.net_adam),
                         "splat_adam": _to_numpy(state.splat_adam),
                         "iteration": int(state.iteration)}, f)


def load_s3_ckpt(model_path, name: str = "ckpt") -> Dict:
    """Returns the pickled dict (epoch, net_params, net_buffers, splats[,
    optimizer states]); raises FileNotFoundError if absent."""
    path = Path(model_path) / name
    with open(path / "net.pkl", "rb") as f:
        net = pickle.load(f)
    optm_path = path / "optm.pkl"
    if optm_path.exists():
        with open(optm_path, "rb") as f:
            net.update(pickle.load(f))
    import jax.numpy as jnp
    from gaussian_garments_tpu.models.gaussian import GaussianParams
    if isinstance(net.get("splats"), GaussianParams):
        net["splats"] = jax.tree.map(jnp.asarray, net["splats"])
    net["net_params"] = jax.tree.map(jnp.asarray, net["net_params"])
    net["net_buffers"] = jax.tree.map(jnp.asarray, net.get("net_buffers", {}))
    return net


def has_s3_ckpt(model_path, name: str = "ckpt") -> bool:
    return (Path(model_path) / name / "net.pkl").exists()


def capture(state) -> Dict:
    """Full optimization-state snapshot incl. optimizer moments — the
    reference's ``GaussianModel.capture()`` tuple (scene/gaussian_model.py:
    61-93) as a pickled numpy pytree. Works on any flax.struct state
    (S2State, S3State)."""
    return {"state": _to_numpy(state)}


def restore(snapshot: Dict, like):
    """Inverse of ``capture``: rebuild the device pytree with the structure of
    ``like`` (GaussianModel.restore :75-93)."""
    import jax.numpy as jnp

    src = snapshot["state"]
    return jax.tree.map(lambda _, v: jnp.asarray(v), like, src)


def save_snapshot(path, state) -> None:
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(capture(state), f)


def load_snapshot(path, like):
    with open(path, "rb") as f:
        return restore(pickle.load(f), like)
