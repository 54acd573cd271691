"""Camera model with the reference's matrix conventions.

The reference (``scene/cameras.py:17-62``, ``utils/graphics_utils.py:31-81``)
stores *transposed* (row-vector) matrices: points transform as
``p_clip = [p, 1] @ full_proj_transform``. We keep the same convention so that
checkpointed cameras / ``cameras.json`` round-trip bit-for-bit and the
rasterizer math matches the CUDA kernel it replaces.

``Camera`` is a pytree (flax.struct dataclass): the matrices are jnp arrays and
participate in jit/vmap; image width/height are static Python ints (pytree
aux data), as XLA needs static render shapes.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_world2view2(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 (non-transposed); reference ``getWorld2View2``."""
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.float32(np.linalg.inv(C2W))


def get_projection_matrix(znear, zfar, fx, fy, cx, cy, w, h) -> np.ndarray:
    """Principal-point-aware perspective projection (non-transposed);
    reference ``utils/graphics_utils.py:51-75``."""
    top = cy / fy * znear
    bottom = -(h - cy) / fy * znear
    right = cx / fx * znear
    left = -(w - cx) / fx * znear

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """One pinhole camera + (optionally) its ground-truth image and masks.

    Matrices use the transposed (row-vector) storage of the reference:
    ``world_view_transform[i, j] = W2V[j, i]``.
    """

    # traced fields
    world_view_transform: jnp.ndarray  # (4,4) transposed world->view
    full_proj_transform: jnp.ndarray   # (4,4) transposed proj @ world->view
    camera_center: jnp.ndarray         # (3,)
    original_image: Optional[jnp.ndarray] = None   # (3,H,W) in [0,1]
    gt_alpha_mask: Optional[jnp.ndarray] = None    # (1,H,W) penalized mask

    # static fields
    image_width: int = struct.field(pytree_node=False, default=0)
    image_height: int = struct.field(pytree_node=False, default=0)
    FoVx: float = struct.field(pytree_node=False, default=0.0)
    FoVy: float = struct.field(pytree_node=False, default=0.0)
    fx: float = struct.field(pytree_node=False, default=0.0)
    fy: float = struct.field(pytree_node=False, default=0.0)
    cx: float = struct.field(pytree_node=False, default=0.0)
    cy: float = struct.field(pytree_node=False, default=0.0)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)
    uid: int = struct.field(pytree_node=False, default=0)
    colmap_id: int = struct.field(pytree_node=False, default=0)
    image_name: str = struct.field(pytree_node=False, default="")

    @property
    def tanfovx(self) -> float:
        return math.tan(self.FoVx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.FoVy * 0.5)

    @property
    def R(self) -> np.ndarray:
        """Camera rotation (world->view transposed back): view[:3,:3].T."""
        return np.asarray(self.world_view_transform)[:3, :3]

    @property
    def T(self) -> np.ndarray:
        return np.asarray(self.world_view_transform)[3, :3]


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    image: Optional[np.ndarray] = None,
    gt_alpha_mask: Optional[np.ndarray] = None,
    znear: float = 0.01,
    zfar: float = 100.0,
    trans=None,
    scale: float = 1.0,
    uid: int = 0,
    colmap_id: int = 0,
    image_name: str = "",
) -> Camera:
    """Build a Camera following the reference constructor
    (``scene/cameras.py:17-62``): R is the camera-to-world rotation, T the
    world-to-view translation (COLMAP convention)."""
    w2v = get_world2view2(R, T, trans, scale)            # (4,4)
    proj = get_projection_matrix(znear, zfar, fx, fy, cx, cy, width, height)
    world_view_transform = w2v.T
    full_proj_transform = (proj @ w2v).T
    camera_center = np.linalg.inv(world_view_transform)[3, :3]

    FoVx = focal2fov(fx, width)
    FoVy = focal2fov(fy, height)

    img = None
    if image is not None:
        img = jnp.clip(jnp.asarray(image, dtype=jnp.float32), 0.0, 1.0)
    mask = None
    if gt_alpha_mask is not None:
        mask = jnp.asarray(gt_alpha_mask, dtype=jnp.float32)

    return Camera(
        world_view_transform=jnp.asarray(world_view_transform),
        full_proj_transform=jnp.asarray(full_proj_transform),
        camera_center=jnp.asarray(camera_center.astype(np.float32)),
        original_image=img,
        gt_alpha_mask=mask,
        image_width=int(width),
        image_height=int(height),
        FoVx=float(FoVx),
        FoVy=float(FoVy),
        fx=float(fx),
        fy=float(fy),
        cx=float(cx),
        cy=float(cy),
        znear=float(znear),
        zfar=float(zfar),
        uid=int(uid),
        colmap_id=int(colmap_id),
        image_name=image_name,
    )


def load_cam(args, id: int, R, T, fx, fy, cx, cy, image: np.ndarray,
             mask: Optional[np.ndarray], image_name: str = "",
             resolution_scale: float = 1.0) -> Camera:
    """Reference ``utils/camera_utils.py:19-62`` ``loadCam``: the -r/--resolution
    downscaling policy (1/2/4/8 divisors, -1 = cap width at 1600, other values
    = target width), then Camera construction. ``image`` is (3,H,W) float."""
    orig_h, orig_w = image.shape[1:]
    res = getattr(args, "resolution", -1)
    if res in (1, 2, 4, 8):
        new_w = round(orig_w / (resolution_scale * res))
        new_h = round(orig_h / (resolution_scale * res))
    else:
        if res == -1:
            global_down = orig_w / 1600 if orig_w > 1600 else 1
        else:
            global_down = orig_w / res
        scale = float(global_down) * float(resolution_scale)
        new_w, new_h = int(orig_w / scale), int(orig_h / scale)

    if (new_w, new_h) != (orig_w, orig_h):
        import jax
        image = np.asarray(jax.image.resize(jnp.asarray(image), (3, new_h, new_w), "bilinear"))
        if mask is not None:
            mask = np.asarray(jax.image.resize(jnp.asarray(mask), (1, new_h, new_w), "bilinear"))
        sx, sy = new_w / orig_w, new_h / orig_h
        fx, fy, cx, cy = fx * sx, fy * sy, cx * sx, cy * sy

    return make_camera(R=R, T=T, fx=fx, fy=fy, cx=cx, cy=cy, width=new_w, height=new_h,
                       image=image, gt_alpha_mask=mask, uid=id, colmap_id=id,
                       image_name=image_name)


def camera_from_json_params(params: dict, h: int = 1280, w: int = 940) -> Camera:
    """Reference ``scene/cameras.py:78-89`` ``get_cam_info``: build a camera
    from an {intrinsics, extrinsics} dict."""
    intrinsic = np.asarray(params["intrinsics"])
    extrinsic = np.asarray(params["extrinsics"])
    R, T = np.transpose(extrinsic[:, :3]), extrinsic[:, 3]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    return make_camera(R=R, T=T, fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h,
                       image=np.zeros([3, h, w], np.float32),
                       gt_alpha_mask=np.zeros([1, h, w], np.float32))


def camera_to_json(id: int, camera: Camera) -> dict:
    """Serialize like the reference ``utils/camera_utils.py:64-84``."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = camera.R.T
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": id,
        "img_name": camera.image_name,
        "width": camera.image_width,
        "height": camera.image_height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(camera.FoVy, camera.image_height),
        "fx": fov2focal(camera.FoVx, camera.image_width),
    }
