"""Numerical parity of the Flax SWGANUnet against the reference torch
implementation (CPU fallback paths), weight-for-weight.

The reference modules are imported read-only from /root/reference purely as a
*test oracle* — none of their code ships in this package.
"""
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaussian_garments_tpu.models import styleunet as S  # noqa: E402

SIZE = 64   # small but covers 3 encoder levels + 3 decoder levels
STYLE = 64


def _load_ref_styleunet():
    """Import the reference styleunet files directly (the scene/ package
    __init__ chains to unavailable deps like open3d/huepy)."""
    import importlib.util
    import types

    if "refsu.styleunet" in sys.modules:
        return sys.modules["refsu.styleunet"]
    pkg = types.ModuleType("refsu")
    pkg.__path__ = ["/root/reference/scene/styleunet"]
    sys.modules["refsu"] = pkg
    # stub the compiled CUDA extensions; the CPU fallback paths never call them
    sys.modules.setdefault("fused", types.ModuleType("fused"))
    sys.modules.setdefault("upfirdn2d", types.ModuleType("upfirdn2d"))
    for name in ["fused_act", "upfirdn2d", "conv2d_gradfix", "styleunet"]:
        spec = importlib.util.spec_from_file_location(
            f"refsu.{name}", f"/root/reference/scene/styleunet/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsu.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsu.styleunet"]


def _ref_net():
    su = _load_ref_styleunet()
    torch.manual_seed(0)
    return su.SWGAN_unet(SIZE, 4, 6, SIZE, STYLE, n_mlp=2)


def _copy_weights(ref, variables):
    """torch state_dict -> flax params (same tensor layouts)."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = jax.tree.map(np.array, variables["params"])
    buf = jax.tree.map(np.array, variables["buffers"])

    def conv_layer(dst, src, downsample):
        i = 1 if downsample else 0
        dst["conv"]["weight"] = sd[f"{src}.{i}.weight"]
        dst["act_bias"] = sd[f"{src}.{i+1}.bias"]

    # mapping MLP (style.0 is PixelNorm)
    for i in range(2):
        p[f"style_{i}"]["weight"] = sd[f"style.{i+1}.weight"]
        p[f"style_{i}"]["bias"] = sd[f"style.{i+1}.bias"]

    conv_layer(p["conv_in"], "conv_in", downsample=True)

    n_enc = int(math.log2(SIZE)) - 2 - 3 + 1
    for j in range(n_enc):
        p[f"from_rgb_{j}"]["conv"]["conv"]["weight"] = sd[f"from_rgbs.{j}.conv.0.weight"]
        p[f"from_rgb_{j}"]["conv"]["act_bias"] = sd[f"from_rgbs.{j}.conv.1.bias"]
        conv_layer(p[f"cond_conv_{j}"]["conv1"], f"cond_convs.{j}.conv1", False)
        conv_layer(p[f"cond_conv_{j}"]["conv2"], f"cond_convs.{j}.conv2", True)

    log_size = int(math.log2(SIZE)) - 1
    n_dec = log_size - 3
    # only the last n_dec comb convs are reachable at this size (the torch
    # module instantiates the full list; flax creates modules lazily)
    for j in range(n_enc + 1 - n_dec, n_enc + 1):
        conv_layer(p[f"comb_{j}"], f"comb_convs.{j}", False)
    for i in range(2 * n_dec):
        p[f"conv_{i}"]["conv"]["weight"] = sd[f"convs.{i}.conv.weight"][0]
        p[f"conv_{i}"]["conv"]["modulation"]["weight"] = sd[f"convs.{i}.conv.modulation.weight"]
        p[f"conv_{i}"]["conv"]["modulation"]["bias"] = sd[f"convs.{i}.conv.modulation.bias"]
        p[f"conv_{i}"]["noise"]["weight"] = sd[f"convs.{i}.noise.weight"]
        p[f"conv_{i}"]["act_bias"] = sd[f"convs.{i}.activate.bias"]
    for l in range(n_dec):
        p[f"to_rgb_{l}"]["conv"]["weight"] = sd[f"to_rgbs.{l}.conv.weight"][0]
        p[f"to_rgb_{l}"]["conv"]["modulation"]["weight"] = sd[f"to_rgbs.{l}.conv.modulation.weight"]
        p[f"to_rgb_{l}"]["conv"]["modulation"]["bias"] = sd[f"to_rgbs.{l}.conv.modulation.bias"]
        p[f"to_rgb_{l}"]["bias"] = sd[f"to_rgbs.{l}.bias"]
    for i in range(2 * n_dec):
        buf[f"noise_{i}"] = sd[f"noises.noise_{i}"]

    return {"params": p, "buffers": buf}


class TestUpfirdn2d:
    def test_matches_reference(self, rng):
        _load_ref_styleunet()
        ref_upfirdn2d = sys.modules["refsu.upfirdn2d"].upfirdn2d
        x = rng.randn(2, 3, 16, 16).astype(np.float32)
        k = S.make_kernel([1, 3, 3, 1])
        for up, down, pad in [(1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (2, 1)), (2, 2, (1, 1)),
                              (2, 1, (1, 0, 1, 0))]:
            ref = ref_upfirdn2d(torch.tensor(x), torch.tensor(k), up=up, down=down, pad=pad)
            ours = S.upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad)
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                                       err_msg=f"up={up} down={down} pad={pad}")

    def test_haar_roundtrip(self, rng):
        x = jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32))
        y = S.inverse_haar_transform(S.haar_transform(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


class TestDiscriminatorParity:
    def _copy(self, ref, variables):
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        p = jax.tree.map(np.array, variables["params"])

        def conv_layer(dst, src, downsample):
            i = 1 if downsample else 0
            dst["conv"]["weight"] = sd[f"{src}.{i}.weight"]
            dst["act_bias"] = sd[f"{src}.{i+1}.bias"]

        log_size = int(math.log2(SIZE)) - 1
        n_lvl = log_size - 2
        for j in range(n_lvl):
            p[f"from_rgb_{j}"]["conv"]["conv"]["weight"] = sd[f"from_rgbs.{j}.conv.0.weight"]
            p[f"from_rgb_{j}"]["conv"]["act_bias"] = sd[f"from_rgbs.{j}.conv.1.bias"]
            conv_layer(p[f"conv_{j}"]["conv1"], f"convs.{j}.conv1", False)
            conv_layer(p[f"conv_{j}"]["conv2"], f"convs.{j}.conv2", True)
        p["from_rgb_final"]["conv"]["conv"]["weight"] = sd[f"from_rgbs.{n_lvl}.conv.0.weight"]
        p["from_rgb_final"]["conv"]["act_bias"] = sd[f"from_rgbs.{n_lvl}.conv.1.bias"]
        conv_layer(p["final_conv"], "final_conv", False)
        for i in range(2):
            p[f"final_linear_{i}"]["weight"] = sd[f"final_linear.{i}.weight"]
            p[f"final_linear_{i}"]["bias"] = sd[f"final_linear.{i}.bias"]
        return {"params": p}

    def test_forward_matches_torch(self, rng):
        su = _load_ref_styleunet()
        torch.manual_seed(1)
        ref = su.Discriminator(SIZE, img_channel=6).eval()
        net = S.Discriminator(size=SIZE, img_channel=6)
        # batch 4 exercises the full minibatch-stddev group
        x = rng.randn(4, 6, SIZE, SIZE).astype(np.float32)

        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = jax.tree.map(jnp.asarray, self._copy(ref, variables))

        with torch.no_grad():
            ref_out = ref(torch.tensor(x))
        ours = net.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   atol=2e-4, rtol=1e-3)

    def test_pose_conditioned_head_shape(self, rng):
        net = S.Discriminator(size=32, img_channel=3, c_dim=10)
        x = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
        pose = jnp.asarray(rng.randn(2, 10).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), x, pose)
        out = net.apply(variables, x, pose)
        assert out.shape == (2, 1) and np.isfinite(np.asarray(out)).all()

    def test_pose_conditioned_head_matches_torch(self, rng):
        """Weight-copy parity for the c_dim>0 projection head: the (B,1)
        logit broadcast against the (B,64) pose embedding,
        normalize_2nd_moment, and the lr_mul=0.01 mapping MLP
        (reference styleunet.py:517-535, :559-563)."""
        su = _load_ref_styleunet()
        torch.manual_seed(2)
        c_dim = 10
        ref = su.Discriminator(SIZE, img_channel=6, c_dim=c_dim).eval()
        net = S.Discriminator(size=SIZE, img_channel=6, c_dim=c_dim)
        x = rng.randn(4, 6, SIZE, SIZE).astype(np.float32)
        pose = rng.randn(4, c_dim).astype(np.float32)

        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(pose))
        copied = self._copy(ref, variables)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        for i in range(4):
            copied["params"][f"mapping_{i}"]["weight"] = sd[f"mapping.{i}.weight"]
            copied["params"][f"mapping_{i}"]["bias"] = sd[f"mapping.{i}.bias"]
        variables = jax.tree.map(jnp.asarray, copied)

        with torch.no_grad():
            ref_out = ref(torch.tensor(x), torch.tensor(pose))
        ours = net.apply(variables, jnp.asarray(x), jnp.asarray(pose))
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestSWGANUnetParity:
    def test_forward_matches_torch(self, rng):
        ref = _ref_net().eval()
        net = S.SWGANUnet(inp_size=SIZE, inp_ch=4, out_ch=6, out_size=SIZE,
                          style_dim=STYLE, n_mlp=2)
        style = (np.ones((1, STYLE)) / np.sqrt(STYLE)).astype(np.float32)
        cond = rng.randn(1, 4, SIZE, SIZE).astype(np.float32)

        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(style), jnp.asarray(cond))
        variables = jax.tree.map(jnp.asarray, _copy_weights(ref, variables))

        with torch.no_grad():
            ref_out, _ = ref([torch.tensor(style)], torch.tensor(cond), randomize_noise=False)
        ours = net.apply(variables, jnp.asarray(style), jnp.asarray(cond))
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=2e-4, rtol=1e-3)
