"""Appearance network — TPU-native AvatarNet.

Reference ``scene/avatar_net.py``: an SWGAN UNet maps the per-frame
[AO(1) + camera-space normal(3)] texture to per-texel [Δxyz(3) +
ΔSH((deg+1)²·3)] (:21, :58-86), with a small conv encoder of per-texel local
view directions injected mid-decoder (:24-28, :75) and a constant style
vector (:23).

Reference quirks reproduced verbatim (parity accounting, SURVEY §7):
- ``viewdir_map[gs_u, gs_u]`` uses (u,u) — not (u,v) — indexing (:74);
- the "camera-space" normal uses the transposed rotation (Rᵀ·n, i.e.
  camera→world) because the einsum contracts the transposed-storage matrix on
  the wrong side (:66-67);
- the viewdir feature is added *after* the level's ToRGB at i==8
  (styleunet.py:846-848) and therefore does not influence the output at 512²
  textures;
- a Fourier embedder is constructed but never used (:15).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_garments_tpu.models import avatar_gaussian as AG
from gaussian_garments_tpu.models import gaussian as G
from gaussian_garments_tpu.models.appearance import get_embedder  # parity (:15)
from gaussian_garments_tpu.models.styleunet import SWGANUnet


class ViewdirNet(nn.Module):
    """Conv2d(3→64,k4,s2,p1) → LeakyReLU(0.2) → Conv2d(64→128,k4,s2,p1)
    (reference :24-28), NCHW."""

    @nn.compact
    def __call__(self, x):
        def conv(x, out_c, name):
            w = self.param(f"{name}_w", nn.initializers.kaiming_normal(), (out_c, x.shape[1], 4, 4))
            b = self.param(f"{name}_b", nn.initializers.zeros, (out_c,))
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=dn) + b.astype(x.dtype).reshape(1, -1, 1, 1)

        x = conv(x, 64, "conv0")
        x = jax.nn.leaky_relu(x, 0.2)
        return conv(x, 128, "conv1")


class AvatarNet(nn.Module):
    texture_size: int
    sh_degree: int
    # mixed precision: bf16 activations through the UNet (params are cast at
    # apply time by the trainer — f32 masters stay in the optimizer); the
    # output is cast back to f32 before apply_shadow
    act_dtype: Any = jnp.float32

    def setup(self):
        # constructed-but-unused Fourier embedder (reference avatar_net.py:15)
        self.embedder, self.embedder_dim = get_embedder(input_dim=7)
        self.shadow_net = SWGANUnet(
            inp_size=self.texture_size, inp_ch=4,
            out_ch=(self.sh_degree + 1) ** 2 * 3 + 3,
            out_size=self.texture_size,
            style_dim=self.texture_size, n_mlp=2,
        )
        self.viewdir_net = ViewdirNet()

    def __call__(self, ambient, normal, world_view_transform, camera_center,
                 bind: AG.AvatarBinding, mesh_v, mesh_f, frames, rows=None):
        """Returns the raw (C_out, res, res) texture output.

        ambient: (1,res,res); normal: (3,res,res) object-space in [0,1].
        ``rows``: optional shared (G,26) frame-row gather
        (``MG.gather_frame_rows``) so hot paths pay the texel gather once.
        """
        from gaussian_garments_tpu.models import mesh_gaussian as MG

        res = self.texture_size
        # "camera-space" normal with the reference's transposed contraction
        valid = (normal.sum(0, keepdims=True) > 0).astype(jnp.float32)
        nw_pad = jnp.concatenate([normal * 2 - 1, jnp.ones((1, res, res))], axis=0) * valid
        nc = jnp.einsum("ab,bcd->acd", world_view_transform, nw_pad)[:3]
        nc = nc / jnp.maximum(jnp.linalg.norm(nc, axis=0, keepdims=True), 1e-12)

        # local view dirs scattered with the (u,u) quirk
        gs_3d = AG.barycentric_3d(bind, mesh_v, mesh_f, rows=rows)
        dir_pp = gs_3d - camera_center[None]
        dir_pp = dir_pp / jnp.maximum(jnp.linalg.norm(dir_pp, axis=1, keepdims=True), 1e-12)
        if rows is None:
            rows9 = MG.gather_frame_rows(frames, bind.binding)[:, MG.FR_R]
        else:
            rows9 = rows[:, MG.FR_R]
        local_viewdir = MG.rows_rot_apply_t(rows9, dir_pp)       # Rᵀ @ dir
        uu_flat = bind.gs_u.astype(jnp.int32) * res + bind.gs_u.astype(jnp.int32)
        if bind.alive is not None:
            # dense layout: redirect dead-texel writes to a dropped dummy row
            # so only alive texels land, matching the compact scatter
            uu_flat = jnp.where(bind.alive, uu_flat, res * res)
            vd_flat = jnp.zeros((res * res + 1, 3)).at[uu_flat].set(
                local_viewdir)[:res * res]
        else:
            vd_flat = jnp.zeros((res * res, 3)).at[uu_flat].set(local_viewdir)
        viewdir_map = vd_flat.reshape(res, res, 3).transpose(2, 0, 1)
        view_feature = self.viewdir_net(viewdir_map[None].astype(self.act_dtype))

        style = jnp.ones((1, self.texture_size), self.act_dtype) / jnp.sqrt(
            float(self.texture_size))
        combined = jnp.concatenate(
            [ambient, nc], axis=0)[None].astype(self.act_dtype)  # (1,4,res,res)
        out = self.shadow_net(style, combined, view_feature=view_feature)
        return out[0].astype(jnp.float32)                        # (C_out,res,res)


def apply_shadow(bind: AG.AvatarBinding, params: G.GaussianParams,
                 shadow_tex: jnp.ndarray, sh_degree: int):
    """Split the net output into per-texel Δxyz and ΔSH and combine with the
    splat parameters (reference :82-85). Returns (local_xyz, shs (G,K,3))."""
    rows = AG.gather_texture(bind, shadow_tex)                    # (G, 3+K*3)
    local_xyz = params.xyz + rows[:, :3]
    n = rows.shape[0]
    delta_sh = rows[:, 3:].reshape(n, -1, 3)
    shs = G.get_features(params) + delta_sh
    return local_xyz, shs
