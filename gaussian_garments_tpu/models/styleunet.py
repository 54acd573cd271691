"""Style-modulated UNet (SWGAN_unet) in Flax.

TPU-native reimplementation of the reference's StyleGAN2-based appearance
network (``scene/styleunet/styleunet.py:634-860`` and its building blocks
:13-632). The reference's three CUDA ops map to XLA as follows
(SURVEY.md §2.5):

- ``fused_bias_act`` → ``leaky_relu(x + b) * √2`` (XLA fuses it);
- ``upfirdn2d``      → one ``lax.conv_general_dilated`` with ``lhs_dilation``
  (zero-insert upsample), explicit padding, flipped depthwise kernel, and
  stride (downsample) — bitwise the CUDA kernel's math
  (``upfirdn2d.py:186-227`` native path);
- ``conv2d_gradfix`` → dropped (a no-op on modern torch, :78-92).

ModulatedConv2d uses the *unfused* formulation (modulate input, plain conv,
demodulate output — ``styleunet.py:228-253``): mathematically identical to
the grouped-conv trick and far friendlier to XLA (one big conv instead of
per-sample weights).

Noise injection: the reference trains with ``randomize_noise=False``
(``avatar_net.py:79``), i.e. fixed buffers drawn once at init — kept here in
a ``buffers`` variable collection (not optimized).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _normal(stddev: float = 1.0):
    return nn.initializers.normal(stddev=stddev)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
    if bias is not None:
        x = x + bias.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def make_kernel(k) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def upfirdn2d(x: jnp.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """(N,C,H,W) upsample-pad-FIR-downsample; reference native semantics."""
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    pad_x0, pad_x1, pad_y0, pad_y1 = pad
    c = x.shape[1]
    kh, kw = kernel.shape
    # flipped kernel (the reference correlates with flip(kernel))
    kflip = jnp.asarray(kernel[::-1, ::-1].copy(), dtype=x.dtype)
    w = jnp.tile(kflip[None, None], (c, 1, 1, 1))  # (C,1,kh,kw) depthwise

    # zero-insert upsample leaves up-1 fewer trailing zeros than the torch
    # native path; fold them into the high padding.
    py0, py1 = pad_y0, pad_y1 + (up - 1)
    px0, px1 = pad_x0, pad_x1 + (up - 1)
    assert py0 >= 0 and py1 >= 0 and px0 >= 0 and px1 >= 0, "negative pads unsupported"

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(up, up),
        dimension_numbers=dn,
        feature_group_count=c,
    )


def _blur_pads(kernel_len: int, kernel_size: int, factor: int, mode: str) -> Tuple[int, int]:
    if mode == "up":       # after conv_transpose (ModulatedConv2d upsample)
        p = (kernel_len - factor) - (kernel_size - 1)
        return (p + 1) // 2 + factor - 1, p // 2 + 1
    if mode == "down":     # before strided conv
        p = (kernel_len - factor) + (kernel_size - 1)
        return (p + 1) // 2, p // 2
    raise ValueError(mode)


class PixelNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", _normal(1.0 / self.lr_mul), (self.out_dim, in_dim))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (w * scale).T
        if self.bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init), (self.out_dim,))
            if self.activation:
                return fused_leaky_relu(out[..., None, None], b * self.lr_mul)[..., 0, 0] \
                    if out.ndim == 2 else fused_leaky_relu(out, b * self.lr_mul)
            out = out + b * self.lr_mul
        elif self.activation:
            return jax.nn.leaky_relu(out, 0.2) * 2**0.5
        return out


class EqualConv2d(nn.Module):
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[1]
        w = self.param("weight", _normal(1.0), (self.out_channel, in_c, self.kernel_size, self.kernel_size))
        scale = 1.0 / math.sqrt(in_c * self.kernel_size**2)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        out = jax.lax.conv_general_dilated(
            x, (w * scale).astype(x.dtype), (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            out = out + b.reshape(1, -1, 1, 1)
        return out


class Upsample(nn.Module):
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel) * (self.factor**2)
        p = k.shape[0] - self.factor
        return upfirdn2d(x, k, up=self.factor, down=1,
                         pad=((p + 1) // 2 + self.factor - 1, p // 2))


class Downsample(nn.Module):
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel)
        p = k.shape[0] - self.factor
        return upfirdn2d(x, k, up=1, down=self.factor, pad=((p + 1) // 2, p // 2))


class ModulatedConv2d(nn.Module):
    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        b, in_c, h, w_ = x.shape
        k = self.kernel_size
        weight = self.param("weight", _normal(1.0), (self.out_channel, in_c, k, k))
        scale = 1.0 / math.sqrt(in_c * k**2)
        s = EqualLinear(in_c, bias_init=1.0, name="modulation")(style)  # (B,in)

        if self.demodulate:
            wmod = (scale * weight)[None] * s[:, None, :, None, None]   # (B,out,in,k,k)
            dcoef = jax.lax.rsqrt(jnp.sum(wmod**2, axis=(2, 3, 4)) + 1e-8)  # (B,out)

        x = x * s[:, :, None, None].astype(x.dtype)
        # weights follow the activation dtype (f32 master params; enables
        # bf16-activation runs where the MXU runs at double rate)
        wk = (weight * scale).astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape, ("NCHW", "OIHW", "NCHW"))

        if self.upsample:
            # conv_transpose(stride 2, pad 0) == dilated conv with flipped kernel
            wt = wk[:, :, ::-1, ::-1]
            out = jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            )
            kb = make_kernel(self.blur_kernel) * 4
            p0, p1 = _blur_pads(len(self.blur_kernel), k, 2, "up")
            out = upfirdn2d(out, kb, pad=(p0, p1))
        elif self.downsample:
            kb = make_kernel(self.blur_kernel)
            p0, p1 = _blur_pads(len(self.blur_kernel), k, 2, "down")
            x = upfirdn2d(x, kb, pad=(p0, p1))
            out = jax.lax.conv_general_dilated(x, wk, (2, 2), ((0, 0), (0, 0)), dimension_numbers=dn)
        else:
            pad = k // 2
            out = jax.lax.conv_general_dilated(x, wk, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=dn)

        if self.demodulate:
            out = out * dcoef[:, :, None, None]
        return out


class NoiseInjection(nn.Module):
    @nn.compact
    def __call__(self, image, noise):
        w = self.param("weight", nn.initializers.zeros, (1,))
        return image + w * noise


class StyledConv(nn.Module):
    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style, noise):
        out = ModulatedConv2d(self.out_channel, self.kernel_size,
                              demodulate=self.demodulate, upsample=self.upsample,
                              blur_kernel=self.blur_kernel, name="conv")(x, style)
        out = NoiseInjection(name="noise")(out, noise)
        b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        return fused_leaky_relu(out, b)


class ConvLayer(nn.Module):
    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            kb = make_kernel(self.blur_kernel)
            p0, p1 = _blur_pads(len(self.blur_kernel), self.kernel_size, 2, "down")
            x = upfirdn2d(x, kb, pad=(p0, p1))
            out = EqualConv2d(self.out_channel, self.kernel_size, stride=2, padding=0,
                              use_bias=self.use_bias and not self.activate, name="conv")(x)
        else:
            out = EqualConv2d(self.out_channel, self.kernel_size, stride=1,
                              padding=self.kernel_size // 2,
                              use_bias=self.use_bias and not self.activate, name="conv")(x)
        if self.activate:
            b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,)) \
                if self.use_bias else None
            out = fused_leaky_relu(out, b)
        return out


class ConvBlock(nn.Module):
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        x = ConvLayer(x.shape[1], 3, name="conv1")(x)
        return ConvLayer(self.out_channel, 3, downsample=True, name="conv2")(x)


def _haar_kernels():
    l = np.ones((1, 2), np.float32) / np.sqrt(2)
    h = l.copy()
    h[0, 0] = -h[0, 0]
    return l.T @ l, h.T @ l, l.T @ h, h.T @ h  # ll, lh, hl, hh


def haar_transform(x):
    ll, lh, hl, hh = _haar_kernels()
    return jnp.concatenate([
        upfirdn2d(x, ll, down=2), upfirdn2d(x, lh, down=2),
        upfirdn2d(x, hl, down=2), upfirdn2d(x, hh, down=2)], axis=1)


def inverse_haar_transform(x):
    ll, lh, hl, hh = _haar_kernels()
    a, b, c, d = jnp.split(x, 4, axis=1)
    return (upfirdn2d(a, ll, up=2, pad=(1, 0, 1, 0))
            + upfirdn2d(b, -lh, up=2, pad=(1, 0, 1, 0))
            + upfirdn2d(c, -hl, up=2, pad=(1, 0, 1, 0))
            + upfirdn2d(d, hh, up=2, pad=(1, 0, 1, 0)))


class FromRGB(nn.Module):
    """use_wt=False variant (the only one SWGAN_unet instantiates)."""
    out_channel: int

    @nn.compact
    def __call__(self, inp, skip):
        inp = Downsample(name="down")(inp)
        out = ConvLayer(self.out_channel, 1, name="conv")(inp)
        if skip is not None:
            out = out + skip
        return inp, out


class ToRGB(nn.Module):
    out_channel: int  # already ×4 (wavelet bands)

    @nn.compact
    def __call__(self, x, style, skip):
        out = ModulatedConv2d(self.out_channel, 1, demodulate=False, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (1, self.out_channel, 1, 1))
        out = out + b
        if skip is not None:
            skip = inverse_haar_transform(skip)
            skip = Upsample(name="up")(skip)
            skip = haar_transform(skip)
            out = out + skip
        return out


class DiscFromRGB(nn.Module):
    """Discriminator FromRGB (``use_wt=True`` variant, reference
    styleunet.py:442-470): inputs live in Haar-wavelet space; a downsample
    level round-trips through pixel space (iwt → blur-down → dwt)."""
    out_channel: int
    downsample: bool = True

    @nn.compact
    def __call__(self, inp, skip):
        if self.downsample:
            inp = inverse_haar_transform(inp)
            inp = Downsample(name="down")(inp)
            inp = haar_transform(inp)
        out = ConvLayer(self.out_channel, 1, name="conv")(inp)
        if skip is not None:
            out = out + skip
        return inp, out


def _minibatch_stddev(out, group_size: int = 4, feat: int = 1):
    """Reference styleunet.py:541-548 (StyleGAN2 minibatch stddev): biased
    per-group feature stddev, averaged, tiled back over the batch."""
    b, c, h, w = out.shape
    g = min(b, group_size)
    s = out.reshape(g, b // g, feat, c // feat, h, w)
    sd = jnp.sqrt(s.var(axis=0) + 1e-8)                      # (B/g,f,C/f,H,W)
    sd = jnp.mean(sd, axis=(2, 3, 4), keepdims=True)[:, :, 0]  # (B/g,f,1,1)
    return jnp.tile(sd, (g, 1, h, w))                        # (B,f,H,W)


class Discriminator(nn.Module):
    """StyleGAN2 wavelet discriminator (reference styleunet.py:473-565).

    Unused by every reference training script (SURVEY §2.4 — the appearance
    stage trains SWGAN_unet purely with photometric losses); provided for
    API completeness and any eval-time GAN metrics. Weight-for-weight torch
    parity is enforced by ``tests/test_styleunet.py``."""
    size: int
    img_channel: int = 6
    channel_multiplier: int = 2
    c_dim: int = 0

    @nn.compact
    def __call__(self, x, flat_pose=None):
        log_size = int(math.log2(self.size)) - 1
        x = haar_transform(x)
        out = None
        in_channel = _channels(self.size, self.channel_multiplier)
        for j, i in enumerate(range(log_size, 2, -1)):
            out_channel = _channels(2 ** (i - 1), self.channel_multiplier)
            x, out = DiscFromRGB(in_channel, downsample=(i != log_size),
                                 name=f"from_rgb_{j}")(x, out)
            out = ConvBlock(out_channel, name=f"conv_{j}")(out)
            in_channel = out_channel
        x, out = DiscFromRGB(_channels(4, self.channel_multiplier),
                             name="from_rgb_final")(x, out)

        out = jnp.concatenate([out, _minibatch_stddev(out)], axis=1)
        out = ConvLayer(_channels(4, self.channel_multiplier), 3,
                        name="final_conv")(out)
        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(_channels(4, self.channel_multiplier),
                          activation="fused_lrelu", name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)

        if self.c_dim > 0:
            # pose-conditioned projection head (reference :517-535, :559-563)
            e = flat_pose
            for i in range(4):
                e = EqualLinear(64, lr_mul=0.01, activation="fused_lrelu",
                                name=f"mapping_{i}")(e)
            e = e * jax.lax.rsqrt(jnp.mean(e**2, axis=1, keepdims=True) + 1e-8)
            out = jnp.sum(out * e, axis=1, keepdims=True) / math.sqrt(self.c_dim)
        return out


_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512}


def _channels(res: int, channel_multiplier: int = 2) -> int:
    base = {64: 256, 128: 128, 256: 64, 512: 32, 1024: 16}
    return _CHANNELS.get(res) or base[res] * channel_multiplier


class SWGANUnet(nn.Module):
    """SWGAN_unet (reference styleunet.py:634-860): blurred-downsample cond
    encoder + StyleGAN2 decoder with Haar-wavelet skip accumulation.

    The viewdir feature injection point is kept verbatim — *after* the
    level's ToRGB at i==8 (:846-848), which at 512² textures means it does
    not influence the output (a reference quirk, documented in SURVEY §7)."""

    inp_size: int
    inp_ch: int
    out_ch: int
    out_size: int
    style_dim: int
    n_mlp: int
    middle_size: int = 8
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, style, condition_img, view_feature=None, noise: Optional[List] = None):
        middle_log = int(math.log2(self.middle_size))
        log_size = int(math.log2(self.out_size)) - 1
        n_latent = log_size * 2 - (middle_log * 2 - 1) + 1
        num_layers = (log_size - middle_log) * 2

        # --- mapping network ---
        s = PixelNorm()(style)
        for i in range(self.n_mlp):
            s = EqualLinear(self.style_dim, lr_mul=0.01, activation="fused_lrelu",
                            name=f"style_{i}")(s)
        latent = jnp.repeat(s[:, None, :], n_latent, axis=1)   # (B, n_latent, D)

        # --- fixed noise buffers (randomize_noise=False path) ---
        if noise is None:
            noise = []
            for layer_idx in range(num_layers):
                res = 2 ** ((layer_idx + 2 * (middle_log + 1)) // 2)
                buf = self.variable(
                    "buffers", f"noise_{layer_idx}",
                    lambda r=res: jax.random.normal(jax.random.PRNGKey(layer_idx), (1, 1, r, r)),
                )
                noise.append(buf.value)

        # --- condition encoder ---
        in_channel = _channels(self.inp_size // 2, self.channel_multiplier)
        cond_img = condition_img
        cond_out = ConvLayer(in_channel, 3, downsample=True, name="conv_in")(cond_img)
        cond_list = [cond_out]
        enc_levels = list(range(int(math.log2(self.inp_size)) - 2, middle_log - 1, -1))
        for j, i in enumerate(enc_levels):
            out_channel = _channels(2**i, self.channel_multiplier)
            cond_img, cond_out = FromRGB(in_channel, name=f"from_rgb_{j}")(cond_img, cond_out)
            cond_out = ConvBlock(out_channel, name=f"cond_conv_{j}")(cond_out)
            cond_list.append(cond_out)
            in_channel = out_channel

        # --- decoder ---
        n_comb = len(enc_levels) + 1
        in_channel = _channels(self.middle_size, self.channel_multiplier)
        skip = None
        out = None
        i = 0
        for lvl, res_log in enumerate(range(middle_log + 1, log_size + 1)):
            out_channel = _channels(2**res_log, self.channel_multiplier)
            if i == 0:
                out = ConvLayer(cond_list[-1].shape[1], 3, name=f"comb_{n_comb-1}")(cond_list[-1])
            elif i < 2 * n_comb:
                cat = jnp.concatenate([out, cond_list[-1 - (i // 2)]], axis=1)
                out = ConvLayer(cond_list[-1 - (i // 2)].shape[1], 3, name=f"comb_{n_comb-1-(i//2)}")(cat)
            out = StyledConv(out_channel, 3, upsample=True, name=f"conv_{i}")(out, latent[:, i], noise[i])
            out = StyledConv(out_channel, 3, name=f"conv_{i+1}")(out, latent[:, i + 1], noise[i + 1])
            skip = ToRGB(self.out_ch * 4, name=f"to_rgb_{lvl}")(out, latent[:, i + 2], skip)
            if view_feature is not None and i == 8:
                vf = jax.image.resize(view_feature, (*view_feature.shape[:2], *out.shape[-2:]), "bilinear")
                out = out + vf
            i += 2

        return inverse_haar_transform(skip)
