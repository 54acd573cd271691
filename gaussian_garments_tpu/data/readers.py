"""Frame / dataset readers.

- ``FrameDataloader``: eager whole-frame loader for stage 2 — per-camera
  filename indexing with the first-camera dedup shortcut, then
  ``load_frame(t)`` loads every camera's RGB + garment mask + foreground mask
  into ``Camera`` objects. Reference ``scene/dataset_readers.py:53-159``.
- ``AvatarDataset``: the (sequence, frame, camera) product over all sequences
  of a subject for stage 3, with on-demand AO/normal baking (ours, not
  Blender) cached on disk. Reference ``scene/dataloader.py:17-283``.

Host-side IO only — outputs are numpy/Camera pytrees ready to batch/shard.
"""
from __future__ import annotations

import json
import os
import random
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from gaussian_garments_tpu.config import DEFAULTS
from gaussian_garments_tpu.utils.camera import Camera, focal2fov, make_camera
from gaussian_garments_tpu.utils.io import load_masked_image, read_obj


def _index_camera_files(cam_paths: List[Path]):
    """Per-camera filename lists with the first-camera dedup shortcut
    (dataset_readers.py:73-106)."""
    img_names, gm_names, fg_names = {}, {}, {}
    cam_to_copy_from = None
    for i, cam_path in enumerate(cam_paths):
        cam_name = cam_path.name
        if cam_to_copy_from is not None:
            img_names[cam_name] = img_names[cam_to_copy_from]
            gm_names[cam_name] = gm_names[cam_to_copy_from]
            fg_names[cam_name] = fg_names[cam_to_copy_from]
            continue
        img_files = sorted((cam_path / DEFAULTS.rgb_images).glob("*.png")) or \
            sorted((cam_path / DEFAULTS.rgb_images).glob("*.jpg"))
        gm_files = sorted((cam_path / DEFAULTS.garment_masks).glob("*.png")) or \
            sorted((cam_path / DEFAULTS.garment_masks).glob("*.jpg"))
        fg_files = sorted((cam_path / DEFAULTS.foreground_masks).glob("*.png"))
        img_names[cam_name] = [f.name for f in img_files]
        gm_names[cam_name] = [f.name for f in gm_files]
        fg_names[cam_name] = [f.name for f in fg_files]
        if i == 1:
            first = cam_paths[0].name
            if img_names[cam_name] and img_names[first] and img_names[cam_name][0] == img_names[first][0]:
                cam_to_copy_from = first
    return img_names, gm_names, fg_names


def _camera_from_params(params: dict, width: int, height: int, uid: int,
                        image: Optional[np.ndarray], mask: Optional[np.ndarray],
                        image_name: str = "") -> Camera:
    intr = np.asarray(params["intrinsics"])
    extr = np.asarray(params["extrinsics"])
    R, T = np.transpose(extr[:, :3]), extr[:, 3]
    return make_camera(
        R=R, T=T, fx=intr[0, 0], fy=intr[1, 1], cx=intr[0, 2], cy=intr[1, 2],
        width=width, height=height, image=image, gt_alpha_mask=mask,
        uid=uid, colmap_id=uid, image_name=image_name,
    )


def _resolve_process(process_index, process_count):
    """Multi-host identity for input sharding (SURVEY §2.6 table row 4).

    Defaults to ``jax.process_index()/process_count()`` — 0/1 on a single
    host, so single-host behavior is unchanged. Image bytes move host→chip
    over PCIe per process; nothing input-related crosses DCN (each host only
    reads its own slice; gradients meet via psum over ICI in the step fns).
    """
    if process_index is not None and process_count is not None:
        return int(process_index), max(int(process_count), 1)
    import jax

    try:
        return jax.process_index(), max(jax.process_count(), 1)
    except Exception:
        return 0, 1


class FrameDataloader:
    """Stage-2 loader: all cameras of one frame (dataset_readers.py:53-159).

    With multiple processes, each host loads a disjoint strided slice of the
    camera list (per-host input sharding; the reference's single-process
    analogue is the DataLoader prefetch, s3_appearance.py:99-100).
    """

    def __init__(self, args, process_index=None, process_count=None):
        self.subject_out = args.subject_out
        self.white_background = args.white_background
        self.process_index, self.process_count = _resolve_process(
            process_index, process_count)
        seq_path = Path(DEFAULTS.data_root) / args.subject / args.sequence
        self.cam_paths = sorted([p for p in seq_path.iterdir() if p.is_dir() and p.name != "smplx"])
        if self.process_count > 1:
            self.cam_paths = self.cam_paths[self.process_index::self.process_count]
        self.camera_params = json.load(open(seq_path / "cameras.json"))
        self.cam_num = len(self.cam_paths)
        self._img_names, self._gm_names, self._fg_names = _index_camera_files(self.cam_paths)
        self._len = len(self._img_names[self.cam_paths[0].name])
        self.smplx_list = sorted((seq_path / "smplx").glob("*.ply"))
        self.smplx_list = [str(p) for p in self.smplx_list]
        self.cam_info: List[Camera] = []

    def __len__(self):
        return self._len

    def load_frame(self, frame: int) -> List[Camera]:
        bg = np.array([1, 1, 1]) if self.white_background else np.array([0, 0, 0])
        cams = []
        for c_idx, cam_path in enumerate(self.cam_paths):
            name = cam_path.name
            img = cam_path / DEFAULTS.rgb_images / self._img_names[name][frame]
            gm = cam_path / DEFAULTS.garment_masks / self._gm_names[name][frame]
            fg = cam_path / DEFAULTS.foreground_masks / self._fg_names[name][frame]
            d = load_masked_image(img, gm, fg, bg)
            h, w = d["masked_img"].shape[:2]
            image = d["masked_img"].astype(np.float32).transpose(2, 0, 1) / 255.0
            mask = d["penalized_mask"].astype(np.float32)[None]
            cams.append(_camera_from_params(self.camera_params[name], w, h, c_idx,
                                            image, mask, image_name=name))
        self.cam_info = sorted(cams, key=lambda c: c.image_name)
        return self.cam_info


class AvatarDataset:
    """Stage-3 dataset over (sequence, frame, camera) items
    (scene/dataloader.py:17-200), with our AO/normal baker."""

    def __init__(self, args, bind=None, process_index=None, process_count=None):
        self.data_dir = Path(DEFAULTS.data_root) / args.subject
        self.output_dir = Path(args.subject_out)
        self.bg = np.array([1, 1, 1]) if args.white_background else np.array([0, 0, 0])
        self.random_bg = args.random_bg
        self.blur_mask = getattr(args, "blur_mask", False)
        self.texture_size = args.texture_size
        self.bind = bind
        self.shuffle = bool(args.shuffle)
        # multi-host input sharding (SURVEY §2.6): each process sees a
        # disjoint strided slice of the item list; the shuffle seed is shared
        # so slices stay disjoint across hosts
        self.process_index, self.process_count = _resolve_process(
            process_index, process_count)

        template = self.output_dir / DEFAULTS.stage1 / "template_uv.obj"
        self.template = read_obj(template) if template.exists() else None

        self.dataset_info: Dict[str, dict] = {}
        self._all_items: List[Tuple[str, int, str]] = []
        self.eval_collection: List[Tuple[str, int, str]] = []
        for seq_path in sorted(p for p in self.data_dir.iterdir() if p.is_dir()):
            seq = seq_path.name
            cam_folders = sorted([p for p in seq_path.iterdir() if p.is_dir() and p.name != "smplx"])
            if args.eval:
                cam_names = [c.name for i, c in enumerate(cam_folders) if i % args.llffhold != 0]
                eval_names = [c.name for i, c in enumerate(cam_folders) if i % args.llffhold == 0]
            else:
                cam_names = [c.name for c in cam_folders]
                eval_names = []
            img_names, gm_names, fg_names = _index_camera_files(cam_folders)
            info = {
                "cam_names": cam_names,
                "json_path": seq_path / "cameras.json",
                "img_names": img_names, "gm_names": gm_names, "fg_names": fg_names,
                "frame_num": len(img_names[cam_folders[0].name]),
            }
            self.dataset_info[seq] = info
            self._all_items += [(seq, f, c) for f in range(info["frame_num"])
                                for c in cam_names]
            self.eval_collection += [(seq, f, c) for f in range(info["frame_num"])
                                     for c in eval_names]
        self.reshuffle(epoch=0)

    def reshuffle(self, epoch: int):
        """Per-epoch reshuffle (reference ``DataLoader(shuffle=True)``,
        s3_appearance.py:99) + per-host strided slice."""
        items = list(self._all_items)
        if self.shuffle:
            random.Random(31359 + epoch).shuffle(items)
        self.frame_collection = items[self.process_index::self.process_count]

    def __len__(self):
        return len(self.frame_collection)

    def eval_item(self, index: int) -> dict:
        """Load a held-out (llffhold) item for quality metrics."""
        return self.load_frame(*self.eval_collection[index % len(self.eval_collection)])

    def __getitem__(self, index: int):
        return self.load_frame(*self.frame_collection[index])

    def load_frame(self, seq: str, frame: int, cam: str) -> dict:
        info = self.dataset_info[seq]
        bg = np.random.rand(3) if self.random_bg else self.bg

        folder = info["json_path"].parent / cam
        d = load_masked_image(
            folder / DEFAULTS.rgb_images / info["img_names"][cam][frame],
            folder / DEFAULTS.garment_masks / info["gm_names"][cam][frame],
            folder / DEFAULTS.foreground_masks / info["fg_names"][cam][frame],
            bg,
        )
        image = d["masked_img"].astype(np.float32).transpose(2, 0, 1) / 255.0
        mask = d["penalized_mask"].astype(np.float32)[None]
        h, w = image.shape[1:]
        params = json.load(open(info["json_path"]))[cam]
        camera = _camera_from_params(params, w, h, 0, image, mask, image_name=cam)

        mesh_path = self.output_dir / DEFAULTS.stage2 / seq / "meshes" / f"frame_{frame:05d}.obj"
        body_path = self.data_dir / seq / "smplx" / f"{frame:05d}.ply"
        ambient, normal, mesh_v = self.get_maps(mesh_path, body_path)
        return {
            "current_seq": seq, "current_frame": frame, "bg": bg.astype(np.float32),
            "camera": camera, "ambient": ambient, "normal": normal, "mesh_v": mesh_v,
        }

    def get_maps(self, mesh_path: Path, body_path: Optional[Path] = None):
        """AO/normal textures with per-frame disk cache
        (dataloader.py:202-277 — Blender replaced by ``data.baker``)."""
        from gaussian_garments_tpu.data.baker import bake_textures
        from gaussian_garments_tpu.utils.io import read_ply

        mesh = read_obj(mesh_path)
        cache = mesh_path.parents[1] / "texture" / f"{mesh_path.stem}.npz"
        occluders = []
        if body_path is not None and Path(body_path).exists():
            body = read_ply(body_path)
            bv = np.stack([body["x"], body["y"], body["z"]], axis=1)
            # body faces: the smplx ply is a triangle mesh; read faces too
            bf = body.get("faces")
            if bf is not None:
                occluders.append((bv, bf))
        ambient, normal = bake_textures(
            self.bind, mesh["vertices"], mesh["faces"], occluders=occluders,
            cache_path=str(cache),
        )
        return ambient, normal, mesh["vertices"].astype(np.float32)
