"""Observability: structured per-step scalar logging, step timing, and debug
render panels.

The reference's only observability is tqdm postfix dicts with cumulative
average losses (``s2_registration.py:65-78``, ``s3_appearance.py:39-47``) and
side-by-side debug renders the README instructs humans to inspect
(SURVEY.md §4-§5). Here:

- ``MetricLogger``: running averages like the reference's ``logger`` plus an
  append-only JSONL stream (loss terms, splat count, radii stats, timings) —
  machine-checkable instead of eyeball-only;
- ``StepTimer``: wall-clock per-phase timing (the reference creates CUDA
  events but never reads them — s2_registration.py:203-204,237,307);
- ``debug_panel``: the stage-2 saver's GT | penalized mask | render |
  abs-diff panel (s2_registration.py:98-122) from our renderer's outputs;
- ``trace``: context manager around ``jax.profiler`` for TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None):
        self.sums: Dict[str, float] = {}
        self.count = 0
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._f = open(jsonl_path, "a")
        else:
            self._f = None

    def log(self, step: int, scalars: Dict[str, float], **extra):
        vals = {k: float(v) for k, v in scalars.items()}
        self.count += 1
        for k, v in vals.items():
            self.sums[k] = self.sums.get(k, 0.0) + v
        if self._f is not None:
            rec = {"step": int(step), **vals,
                   **{k: (v if isinstance(v, str) else float(v))
                      for k, v in extra.items()},
                   "time": time.time()}
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return self.averages()

    def averages(self) -> Dict[str, float]:
        """Cumulative averages — the reference's tqdm postfix semantics."""
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}

    def close(self):
        if self._f is not None:
            self._f.close()


class StepTimer:
    """Per-phase wall timing with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.avg: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.avg[name] = dt if name not in self.avg else \
            (1 - self.alpha) * self.avg[name] + self.alpha * dt


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def shaded_mesh_image(verts, faces, camera, body_v=None, body_f=None) -> np.ndarray:
    """Flat-shaded render of the tracked garment mesh (tinted blue) over the
    body mesh (gray) — the role of the reference saver's aitviewer column
    (s2_registration.py:40-62,110-113): the one human oracle for "is the
    tracking sane". Depth-correct by rasterizing both meshes jointly.
    Returns (3,H,W) float in [0,1]; background white like aitviewer."""
    import jax.numpy as jnp

    from gaussian_garments_tpu.ops.mesh_raster import rasterize_mesh

    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    n_garment = len(f)
    if body_v is not None and len(body_v):
        bf = np.asarray(body_f, np.int64) + len(v)
        v = np.concatenate([v, np.asarray(body_v, np.float32)])
        f = np.concatenate([f, bf])
    p2f, _ = rasterize_mesh(
        jnp.asarray(v), jnp.asarray(f.astype(np.int32)),
        camera.world_view_transform, camera.full_proj_transform,
        image_width=camera.image_width, image_height=camera.image_height)
    p2f = np.asarray(p2f)

    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    normals = np.cross(e1, e2)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    centers = v[f].mean(axis=1)
    view = np.asarray(camera.camera_center)[None] - centers
    view /= np.maximum(np.linalg.norm(view, axis=1, keepdims=True), 1e-12)
    lambert = np.abs((normals * view).sum(axis=1))
    shade = 0.3 + 0.7 * lambert                                 # headlight
    tint = np.where((np.arange(len(f)) < n_garment)[:, None],
                    np.array([[0.55, 0.70, 1.00]]), np.array([[0.80, 0.80, 0.80]]))
    face_rgb = shade[:, None] * tint

    img = np.ones((camera.image_height, camera.image_width, 3), np.float32)
    hit = p2f >= 0
    img[hit] = face_rgb[p2f[hit]]
    return img.transpose(2, 0, 1)


def debug_panel(gt_image: np.ndarray, penalized_mask: np.ndarray,
                render: np.ndarray, path: Optional[str] = None,
                mesh_render: Optional[np.ndarray] = None) -> np.ndarray:
    """GT | penalized mask | render | abs-diff [| shaded mesh] row panel
    (s2_registration.py:98-122; the mesh column mirrors the aitviewer
    composite at :110-113). Inputs (3,H,W)/(1,H,W) in [0,1]."""
    gt = np.asarray(gt_image).transpose(1, 2, 0)
    rd = np.clip(np.asarray(render), 0, 1).transpose(1, 2, 0)
    mask = np.repeat(np.asarray(penalized_mask).transpose(1, 2, 0), 3, axis=2)
    diff = np.abs(gt - rd)
    cols = [gt, mask, rd, diff]
    if mesh_render is not None:
        cols.append(np.clip(np.asarray(mesh_render), 0, 1).transpose(1, 2, 0))
    panel = np.concatenate(cols, axis=1)
    if path is not None:
        from gaussian_garments_tpu.utils.io import save_image
        # save_image expects floats in [0,1] (it scales by 255 itself;
        # passing a pre-scaled uint8 used to saturate the panel to {0,255})
        save_image(path, panel)
    return panel
