"""Checkpoint / resume for stage 3 and generic pytrees.

Reference ``AvatarNet.save_ckpt/load_ckpt`` (scene/avatar_net.py:89-131):
``ckpt/net.pt`` (epoch, active_sh_degree, state_dict) + ``ckpt/optm.pt`` +
``info.txt``, with auto-resume when ``ckpt/net.pt`` exists (:52-53). We keep
the same directory layout with pickled numpy pytrees (``net.pkl``/
``optm.pkl``) — framework-neutral so checkpoints remain readable without JAX.

An **orbax** backend (``backend="orbax"``) is available for long s3 runs:
sharding-aware, atomic-rename durable, and optionally **async** (the save
overlaps the next training steps; call :func:`wait_for_saves` before exit).
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


_MANAGERS: Dict[str, object] = {}   # target dir -> orbax CheckpointManager


def _manager(target: Path):
    """One CheckpointManager per target dir, reused across saves. The manager
    gives us what a bare ``StandardCheckpointer(force=True)`` does not:
    versioned step dirs with atomic commit markers (a kill mid-save leaves the
    previous checkpoint intact and resumable), stale-tmp cleanup at init (a
    killed writer's ``*.orbax-checkpoint-tmp`` otherwise breaks every later
    save with tensorstore ENOENT rename races — reproduced on the s3 CLI),
    and built-in async with ``wait_until_finished``."""
    import orbax.checkpoint as ocp

    key = str(target)
    m = _MANAGERS.get(key)
    if m is None:
        m = ocp.CheckpointManager(
            key,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=2, create=True, cleanup_tmp_directories=True,
                enable_async_checkpointing=True))
        _MANAGERS[key] = m
    return m


def _state_tree(state, epoch: int, active_sh_degree: int, save_optm: bool):
    tree = {
        "epoch": np.int64(epoch),
        "activate_sh_degree": np.int64(active_sh_degree),
        "net_params": _to_numpy(state.net_params),
        "net_buffers": _to_numpy(state.net_buffers),
        "splats": _to_numpy(state.splats),
    }
    if save_optm:
        tree["net_adam"] = _to_numpy(state.net_adam)
        tree["splat_adam"] = _to_numpy(state.splat_adam)
        tree["iteration"] = np.int64(state.iteration)
    return tree


_LEGACY_FILES = ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt",
                 "d", "ocdbt.process_0")


def _gc_legacy_layout(root: Path) -> None:
    """Drop a pre-manager single-dir checkpoint (bare StandardCheckpointer
    payload at the net.orbax root) once a manager step dir exists: load_s3_ckpt
    prefers step dirs, so the legacy arrays are dead weight that would double
    checkpoint disk forever."""
    import shutil

    if not any(p.is_dir() and p.name.isdigit() for p in root.iterdir()):
        return
    # only GC when a legacy PAYLOAD marker is actually present: the name list
    # includes '_CHECKPOINT_METADATA', which orbax also uses for per-step
    # metadata — an orbax version that writes step-style metadata at the ROOT
    # would otherwise lose manager state after every save (ADVICE r3)
    if not ((root / "d").exists() or (root / "manifest.ocdbt").exists()):
        return
    for name in _LEGACY_FILES:
        p = root / name
        if p.is_dir():
            shutil.rmtree(p, ignore_errors=True)
        elif p.exists():
            try:
                p.unlink()
            except OSError:
                pass


def _save_orbax(path: Path, state, epoch, active_sh_degree, save_optm,
                async_save: bool) -> None:
    import orbax.checkpoint as ocp

    tree = _state_tree(state, epoch, active_sh_degree, save_optm)
    root = (path / "net.orbax").absolute()
    m = _manager(root)
    # step = epoch, and a mid-epoch save + the end-of-epoch save share the
    # step. orbax's force=True does NOT overwrite an existing step (its
    # docstring: "will not overwrite existing checkpoints"); a second save of
    # the same step raises StepAlreadyExistsError. Drop the stale same-epoch
    # step first (wait for any async write to commit so delete sees it).
    m.wait_until_finished()
    if int(epoch) in m.all_steps():
        m.delete(int(epoch))
    m.save(int(epoch), args=ocp.args.StandardSave(tree), force=True)
    if not async_save:
        m.wait_until_finished()
    _gc_legacy_layout(root)


def wait_for_saves() -> None:
    """Block until any in-flight async orbax save has committed (call before
    process exit or before reading the checkpoint back)."""
    for m in _MANAGERS.values():
        m.wait_until_finished()


def save_s3_ckpt(model_path, state, epoch: int, active_sh_degree: int = 3,
                 save_optm: bool = True, name: str = "ckpt",
                 backend: str = "pickle", async_save: bool = False) -> None:
    """state: training.s3.S3State. ``backend``: "pickle" (default, reference
    layout) or "orbax" (+ ``async_save`` to overlap the write with training)."""
    path = Path(model_path) / name
    os.makedirs(path, exist_ok=True)
    with open(path / "info.txt", "w") as f:
        f.write(f"Epoch {epoch}\n")
    if backend == "orbax":
        return _save_orbax(path, state, epoch, active_sh_degree, save_optm,
                           async_save)
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
    """Returns the checkpoint dict (epoch, net_params, net_buffers, splats[,
    optimizer states]); raises FileNotFoundError if absent. Reads whichever
    backend wrote the checkpoint (orbax dir preferred if both exist)."""
    import jax.numpy as jnp
    from gaussian_garments_tpu.models.gaussian import GaussianParams

    path = Path(model_path) / name
    orbax_dir = path / "net.orbax"
    if orbax_dir.exists():
        import orbax.checkpoint as ocp
        wait_for_saves()
        m = _manager(orbax_dir.absolute())
        step = m.latest_step()
        if step is not None:
            net = dict(m.restore(step, args=ocp.args.StandardRestore()))
        else:
            # legacy r2 single-dir layout (bare StandardCheckpointer target)
            net = ocp.StandardCheckpointer().restore(orbax_dir.absolute())
        # orbax restores NamedTuples as plain dicts without a template
        if isinstance(net.get("splats"), dict):
            net["splats"] = GaussianParams(**net["splats"])
        for k in ("epoch", "activate_sh_degree", "iteration"):
            if k in net:
                net[k] = int(net[k])
    else:
        with open(path / "net.pkl", "rb") as f:
            net = pickle.load(f)
        optm_path = path / "optm.pkl"
        if optm_path.exists():
            with open(optm_path, "rb") as f:
                net.update(pickle.load(f))
    if isinstance(net.get("splats"), GaussianParams):
        net["splats"] = jax.tree.map(jnp.asarray, net["splats"])
    net["net_params"] = jax.tree.map(jnp.asarray, net["net_params"])
    net["net_buffers"] = jax.tree.map(jnp.asarray, net.get("net_buffers", {}))
    return net


def has_s3_ckpt(model_path, name: str = "ckpt") -> bool:
    path = Path(model_path) / name
    if (path / "net.pkl").exists():
        return True
    od = path / "net.orbax"
    if not od.is_dir():
        return False
    # a COMMITTED checkpoint only: a digit-named manager step dir (tmp dirs
    # carry a suffix) or the legacy single-dir layout's metadata file — an
    # empty/uncommitted dir left by a killed first save must not trip resume
    if any(p.is_dir() and p.name.isdigit() for p in od.iterdir()):
        return True
    return (od / "_CHECKPOINT_METADATA").exists()


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
