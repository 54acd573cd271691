"""Pallas kernel tests (interpret mode — runs on CPU): forward parity vs the
exact oracle and analytic-backward parity vs oracle autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_garments_tpu.ops.pallas_tiles import _forward, rasterize_pallas
from gaussian_garments_tpu.ops.projection import project_gaussians
from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
from gaussian_garments_tpu.utils.camera import make_camera

H = W = 64


def _scene(rng, n=150):
    means = rng.randn(n, 3).astype(np.float32) * 0.3
    scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.4 - 3.2)
    rots = rng.randn(n, 4).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.randn(n, 1)))).astype(np.float32).reshape(-1)
    shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
    cam = make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=150, fy=150,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    return means, scales, rots, opac, shs, cam


def _proj(cam, m, s, r, o, sh):
    return project_gaussians(
        m, cam.world_view_transform, cam.full_proj_transform, cam.camera_center,
        image_width=W, image_height=H, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        scales=s, rotations=r, shs=sh, opacities=o, sh_degree=0)


class TestPallasForward:
    def test_matches_oracle(self, rng):
        means, scales, rots, opac, shs, cam = _scene(rng)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        bg = jnp.asarray([0.1, 0.2, 0.3])
        ir, dr, ar = rasterize_reference(proj, image_height=H, image_width=W, bg=bg)
        ip, dp, ap, aux = _forward(proj, bg, image_height=H, image_width=W,
                                   max_tiles_side=6, pair_budget=8192, interpret=True)
        np.testing.assert_allclose(np.asarray(ip), np.asarray(ir), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dr), atol=2e-4)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ar), atol=2e-5)
        assert int(aux["n_overflow"]) == 0

    def test_matches_oracle_low_opacity(self, rng):
        """Opacity-aware tight extents must be EXACT: pairs they cull have
        alpha < 1/255 everywhere, which the kernel (and the oracle) mask to
        zero contribution anyway. Mixed near-zero/low/high opacities."""
        means, scales, rots, opac, shs, cam = _scene(rng)
        opac = opac.copy()
        opac[::3] = 0.01                     # opacity-reset regime
        opac[1::3] = 0.002                   # below 1/255: fully culled
        proj = _proj(cam, jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(shs))
        bg = jnp.asarray([0.1, 0.2, 0.3])
        ir, dr, ar = rasterize_reference(proj, image_height=H, image_width=W, bg=bg)
        ip, dp, ap, _ = _forward(proj, bg, image_height=H, image_width=W,
                                 max_tiles_side=6, pair_budget=8192, interpret=True)
        np.testing.assert_allclose(np.asarray(ip), np.asarray(ir), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ar), atol=2e-5)

        # the tight extents must generate strictly fewer pairs than the
        # radii-based rects at these opacities
        from gaussian_garments_tpu.ops.pallas_tiles import pack_pairs
        pp = pack_pairs(proj, tiles_x=-(-W // 16), tiles_y=-(-H // 16),
                        max_tiles_side=6, pair_budget=8192)
        r = np.asarray(proj.radii)
        x0 = np.clip(np.floor((np.asarray(proj.means2d)[:, 0] - r) / 16), 0, -(-W // 16))
        x1 = np.clip(np.floor((np.asarray(proj.means2d)[:, 0] + r + 15) / 16) + 1, 0, -(-W // 16))
        y0 = np.clip(np.floor((np.asarray(proj.means2d)[:, 1] - r) / 16), 0, -(-H // 16))
        y1 = np.clip(np.floor((np.asarray(proj.means2d)[:, 1] + r + 15) / 16) + 1, 0, -(-H // 16))
        full = int((np.minimum(x1 - x0, 6) * np.minimum(y1 - y0, 6))[r > 0].sum())
        assert int(pp.n_valid) < full * 0.7, (int(pp.n_valid), full)

    def test_budget_overflow_reported(self, rng):
        means, scales, rots, opac, shs, cam = _scene(rng, n=100)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        _, _, _, aux = _forward(proj, jnp.zeros(3), image_height=H, image_width=W,
                                max_tiles_side=6, pair_budget=128, interpret=True)
        assert int(aux["n_overflow"]) > 0

    def test_budget_overflow_reported_through_custom_vjp(self, rng):
        """The public rasterize_pallas (custom_vjp production path) must report
        real truncation diagnostics, not zeros — including through jax.grad
        (VERDICT r1 weak #5; reference CUDA never drops pairs, so any nonzero
        n_overflow must surface in training logs)."""
        means, scales, rots, opac, shs, cam = _scene(rng, n=100)
        arrs = tuple(jnp.asarray(x) for x in (means, scales, rots, opac, shs))
        proj = _proj(cam, *arrs)
        _, _, _, aux = rasterize_pallas(
            proj, image_height=H, image_width=W, bg=jnp.zeros(3),
            pair_budget=128, interpret=True)
        assert int(aux["n_overflow"]) > 0
        assert int(aux["n_clipped"]) >= 0

        def loss_and_aux(m):
            p = _proj(cam, m, *arrs[1:])
            img, _, _, a = rasterize_pallas(
                p, image_height=H, image_width=W, bg=jnp.zeros(3),
                pair_budget=128, interpret=True)
            return img.mean(), a

        (_, aux2), g = jax.value_and_grad(loss_and_aux, has_aux=True)(arrs[0])
        assert int(aux2["n_overflow"]) > 0
        assert np.isfinite(np.asarray(g)).all()


class TestPallasBackward:
    def test_gradients_match_oracle_autodiff(self, rng):
        means, scales, rots, opac, shs, cam = _scene(rng, n=120)
        target = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
        bg0 = jnp.asarray([0.1, 0.2, 0.3])

        def mk_loss(raster):
            def loss(m, o, s, r, sh, bg):
                proj = _proj(cam, m, s, r, o, sh)
                out = raster(proj, bg)
                img, d, a = out[0], out[1], out[2]
                return ((img - target) ** 2).mean() + 0.1 * d.mean() + 0.05 * (a ** 2).mean()
            return loss

        lp = mk_loss(lambda p, bg: rasterize_pallas(
            p, image_height=H, image_width=W, bg=bg, interpret=True, pair_budget=8192))
        lr = mk_loss(lambda p, bg: rasterize_reference(p, image_height=H, image_width=W, bg=bg))
        args = tuple(jnp.asarray(x) for x in (means, opac, scales, rots, shs)) + (bg0,)
        gp = jax.grad(lp, argnums=tuple(range(6)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(6)))(*args)
        for name, a, b in zip(("means", "opac", "scales", "rots", "shs", "bg"), gp, gr):
            scale = max(float(jnp.abs(b).max()), 1e-8)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=scale * 1e-4, err_msg=name)

    def test_gradients_with_dead_items_on_saturated_tile(self, rng):
        """Live-item backward filtering under saturation (ADVICE r3): stack
        >CHUNK=256 near-opaque splats on ONE tile so the tile gets >=2 work
        items and the composite saturates inside the FIRST (front) item —
        every later item is dead and must be dropped by the live-boundary
        filtering (dead-item grads under the row-5 log-T restart semantics
        would otherwise be reconstructed with inflated T). The other unit
        scenes never exceed 256 pairs/tile, so this is the only coverage of
        item-granular early exit."""
        n = 600
        means = np.zeros((n, 3), np.float32)
        means[:, 0] = rng.randn(n).astype(np.float32) * 0.015
        means[:, 1] = rng.randn(n).astype(np.float32) * 0.015
        means[:, 2] = np.linspace(-0.4, 0.4, n).astype(np.float32)  # depth spread
        scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.2 - 3.4)
        rots = rng.randn(n, 4).astype(np.float32)
        opac = np.full((n,), 0.97, np.float32)
        shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
        cam = make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=150, fy=150,
                          cx=W / 2, cy=H / 2, width=W, height=H)
        arrs = tuple(jnp.asarray(x) for x in (means, opac, scales, rots, shs))
        proj = _proj(cam, arrs[0], arrs[2], arrs[3], arrs[1], arrs[4])

        # preconditions for the scenario: some tile holds >256 pairs (>=2
        # items) and the composite saturates (alpha ~= 1 at the cluster)
        from gaussian_garments_tpu.ops.pallas_tiles import CHUNK, pack_pairs
        pp = pack_pairs(proj, tiles_x=-(-W // 16), tiles_y=-(-H // 32),
                        max_tiles_side=6, pair_budget=8192)
        assert int(np.asarray(pp.counts).max()) > CHUNK, \
            "scene must force >=2 work items on one tile"
        img_p, _, alpha_p, _ = rasterize_pallas(
            proj, image_height=H, image_width=W, bg=jnp.zeros(3),
            pair_budget=8192, interpret=True)
        assert float(np.asarray(alpha_p).max()) > 0.9999, \
            "scene must saturate (front item kills the rest)"

        target = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
        bg0 = jnp.asarray([0.1, 0.2, 0.3])

        def mk_loss(raster):
            def loss(m, o, s, r, sh, bg):
                p = _proj(cam, m, s, r, o, sh)
                out = raster(p, bg)
                img, d, a = out[0], out[1], out[2]
                return ((img - target) ** 2).mean() + 0.1 * d.mean() + 0.05 * (a ** 2).mean()
            return loss

        lp = mk_loss(lambda p, bg: rasterize_pallas(
            p, image_height=H, image_width=W, bg=bg, interpret=True, pair_budget=8192))
        lr = mk_loss(lambda p, bg: rasterize_reference(p, image_height=H, image_width=W, bg=bg))
        gp = jax.grad(lp, argnums=tuple(range(6)))(*(arrs + (bg0,)))
        gr = jax.grad(lr, argnums=tuple(range(6)))(*(arrs + (bg0,)))
        for name, a, b in zip(("means", "opac", "scales", "rots", "shs", "bg"), gp, gr):
            scale = max(float(jnp.abs(b).max()), 1e-8)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=scale * 2e-4, err_msg=name)


class TestPairCount:
    def test_count_matches_pack_n_valid(self, rng):
        """count_pairs (the pair_budget autosizing probe) must agree exactly
        with the pair count pack_pairs actually generates."""
        from gaussian_garments_tpu.ops.pallas_tiles import count_pairs, pack_pairs

        means, scales, rots, opac, shs, _ = _scene(rng, n=200)
        # include some near-zero opacities (exact culling) and a big splat
        opac = np.asarray(opac).copy()
        opac[:40] = 0.001
        cam = make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=150, fy=150,
                          cx=W / 2, cy=H / 2, width=W, height=H)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        tiles_x, tiles_y = -(-W // 16), -(-H // 16)
        for side in (3, 6):
            pk = pack_pairs(proj, tiles_x=tiles_x, tiles_y=tiles_y,
                            max_tiles_side=side, pair_budget=65536)
            cnt = count_pairs(proj, tiles_x=tiles_x, tiles_y=tiles_y,
                              max_tiles_side=side)
            assert int(cnt) == int(pk.n_valid), (side, int(cnt), int(pk.n_valid))

    def test_row_spans_cull_only_zero_alpha_tiles(self, rng):
        """Every (splat, tile) the row-exact generation culls from the
        bounding rect must have alpha < ALPHA_EPS at ALL the tile's pixels
        (brute-force check), so composites and gradients are exactly
        unchanged. Guards the span math (`_row_spans`) directly — the image
        oracle tests could mask a too-tight span on a low-contribution
        splat."""
        from gaussian_garments_tpu.ops.pallas_tiles import (
            ALPHA_EPS, TILE_H, TILE_W, _row_spans, _tile_rects)

        means, scales, rots, opac, shs, cam = _scene(rng, n=120)
        proj = _proj(cam, *(jnp.asarray(x) for x in
                            (means, scales, rots, opac, shs)))
        tiles_x, tiles_y = -(-W // TILE_W), -(-H // TILE_H)
        side = 6
        x0, y0, x1, y1, alive = _tile_rects(proj, tiles_x=tiles_x,
                                            tiles_y=tiles_y)
        row_w, row_o = _row_spans(proj, x0, y0, x1, y1, alive,
                                  tiles_x=tiles_x, side=side)
        x0, y0, x1, y1 = (np.asarray(v) for v in (x0, y0, x1, y1))
        row_w, row_o = np.asarray(row_w), np.asarray(row_o)
        alive = np.asarray(alive)
        mx, my = np.asarray(proj.means2d).T
        ca, cb, cc = np.asarray(proj.conic).T
        op = np.asarray(proj.opacity)

        pxg, pyg = np.meshgrid(np.arange(TILE_W), np.arange(TILE_H))
        checked_culled = 0
        for i in range(len(mx)):
            if not alive[i] or not np.isfinite([mx[i], my[i]]).all():
                continue
            for r in range(min(side, y1[i] - y0[i])):
                ty = y0[i] + r
                lo = x0[i] + row_o[i, r]
                hi = lo + row_w[i, r]
                assert lo >= x0[i] and hi <= min(x1[i], x0[i] + side)
                for tx in range(x0[i], min(x1[i], x0[i] + side)):
                    if lo <= tx < hi:
                        continue                      # kept pair
                    px = tx * TILE_W + pxg
                    py = ty * TILE_H + pyg
                    dx, dy = mx[i] - px, my[i] - py
                    power = (-0.5 * (ca[i] * dx * dx + cc[i] * dy * dy)
                             - cb[i] * dx * dy)
                    alpha = np.minimum(0.99, op[i] * np.exp(power))
                    alpha = np.where(power > 0, 0.0, alpha)
                    assert alpha.max() < ALPHA_EPS, (
                        i, r, tx, float(alpha.max()))
                    checked_culled += 1
        assert checked_culled > 50  # the scene must actually exercise culls


class TestPallasBatched:
    def test_multicam_matches_per_camera_oracle(self, rng):
        """The camera-flattened C>1 path (flatten_packed compaction, global
        tile/chunk ids, one dynamic-grid launch) must match the exact oracle
        rendered per camera — forward AND gradients."""
        from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas_batch

        means, scales, rots, opac, shs, _ = _scene(rng, n=120)
        cams = [
            make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=150, fy=150,
                        cx=W / 2, cy=H / 2, width=W, height=H),
            make_camera(np.eye(3), np.array([0.3, -0.2, 2.5]), fx=120, fy=130,
                        cx=W / 2 + 3, cy=H / 2 - 2, width=W, height=H),
            make_camera(np.eye(3), np.array([-0.4, 0.1, 3.5]), fx=180, fy=170,
                        cx=W / 2 - 2, cy=H / 2 + 4, width=W, height=H),
        ]
        bg = jnp.asarray([0.1, 0.2, 0.3])
        args = tuple(jnp.asarray(x) for x in (means, scales, rots, opac, shs))
        projs_list = [_proj(c, *args) for c in cams]
        projs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *projs_list)

        imgs, deps, alps, aux = rasterize_pallas_batch(
            projs, image_height=H, image_width=W, bg=bg,
            max_tiles_side=6, pair_budget=8192, interpret=True)
        for c, proj_c in enumerate(projs_list):
            ir, dr, ar = rasterize_reference(
                proj_c, image_height=H, image_width=W, bg=bg)
            np.testing.assert_allclose(np.asarray(imgs[c]), np.asarray(ir), atol=2e-5)
            np.testing.assert_allclose(np.asarray(deps[c]), np.asarray(dr), atol=2e-4)
            np.testing.assert_allclose(np.asarray(alps[c]), np.asarray(ar), atol=2e-5)

        # gradients: batched custom_vjp vs per-camera oracle autodiff
        cot = jnp.asarray(np.random.RandomState(7).rand(3, 3, H, W).astype(np.float32))

        def loss_batch(p):
            img, _, _, _ = rasterize_pallas_batch(
                p, image_height=H, image_width=W, bg=bg,
                max_tiles_side=6, pair_budget=8192, interpret=True)
            return (img * cot).sum()

        g = jax.grad(loss_batch, allow_int=True)(projs)

        for c, proj_c in enumerate(projs_list):
            def loss_ref(p):
                ir, _, _ = rasterize_reference(p, image_height=H, image_width=W, bg=bg)
                return (ir * cot[c]).sum()
            gr = jax.grad(loss_ref, allow_int=True)(proj_c)
            for name in ("means2d", "conic", "opacity", "rgb"):
                a = np.asarray(getattr(g, name)[c])
                b = np.asarray(getattr(gr, name))
                denom = np.abs(b).max() + 1e-8
                np.testing.assert_allclose(a / denom, b / denom, atol=5e-5,
                                           err_msg=f"cam {c} {name}")


class TestHQBinning:
    """HQ-resolution binning: the two-key (tile, rank) co-sort path used when
    ``num_tiles >= 2^13`` — e.g. the reference's 3004×4092 HQ render setting
    (``inference.py:444-445``), 48K tiles — and wide rects up to the 4-bit
    side field (``max_tiles_side <= 15``)."""

    def test_two_key_sort_matches_single_key(self, rng):
        from gaussian_garments_tpu.ops.pallas_tiles import pack_pairs

        means, scales, rots, opac, shs, cam = _scene(rng)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        kw = dict(tiles_x=-(-W // 16), tiles_y=-(-H // 16),
                  max_tiles_side=6, pair_budget=8192)
        a = pack_pairs(proj, **kw)
        b = pack_pairs(proj, _force_two_key=True, **kw)
        nv = int(a.n_valid)
        assert nv == int(b.n_valid) and nv > 0
        np.testing.assert_array_equal(np.asarray(a.sorted_rank)[:nv],
                                      np.asarray(b.sorted_rank)[:nv])
        for f in ("feats_t", "starts", "counts", "chunk_of_item",
                  "tile_of_item", "k_of_item"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)), err_msg=f)

    def test_wide_rects_match_oracle(self, rng):
        """Rect sides up to ~12 tiles (huge splats) through the 4-bit width
        field at max_tiles_side=15 reproduce the exact oracle."""
        W2 = H2 = 256
        n = 10
        means = (rng.randn(n, 3) * 0.25).astype(np.float32)
        scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.2 - 1.3)
        rots = rng.randn(n, 4).astype(np.float32)
        opac = (1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)
        shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
        cam = make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=300, fy=300,
                          cx=W2 / 2, cy=H2 / 2, width=W2, height=H2)
        proj = project_gaussians(
            jnp.asarray(means), cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=W2, image_height=H2,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), opacities=jnp.asarray(opac), sh_degree=0)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        # oracle: the tiled backend (identical rect + masking math). The
        # per-pixel reference composites EVERY splat with no 3σ-circle rect
        # cut, so at these huge-splat sizes it keeps sub-1% alpha tails the
        # whole CUDA rasterizer class deliberately drops (PARITY.md).
        from gaussian_garments_tpu.ops.tiled import rasterize_tiled
        it = rasterize_tiled(proj, image_height=H2, image_width=W2, bg=bg,
                             max_tiles_side=15, tile_capacity=64)
        ip, dp, ap, aux = _forward(proj, bg, image_height=H2, image_width=W2,
                                   max_tiles_side=15, pair_budget=16384,
                                   interpret=True)
        # at least one rect must actually be wider than the old 3-bit limit
        from gaussian_garments_tpu.ops.pallas_tiles import _tile_rects
        x0, y0, x1, y1, alive = _tile_rects(proj, tiles_x=W2 // 16, tiles_y=H2 // 16)
        assert int(jnp.max(jnp.where(alive, x1 - x0, 0))) > 7
        assert int(aux["n_clipped"]) == 0
        np.testing.assert_allclose(np.asarray(ip), np.asarray(it[0]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(it[2]), atol=2e-6)

    def test_exact_fit_budget_bounds(self, rng):
        """With the pair budget exactly full (every slot valid, no junk
        tail) the per-tile bounds must stay inside the table. Regression:
        ``_lower_bound`` walked one past the end for queries greater than
        every element, giving the last covered tile a phantom extra pair."""
        from gaussian_garments_tpu.ops.pallas_tiles import pack_pairs

        means, scales, rots, opac, shs, cam = _scene(rng)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        kw = dict(tiles_x=-(-W // 16), tiles_y=-(-H // 16), max_tiles_side=6)
        full = pack_pairs(proj, pair_budget=8192, **kw)
        budget = int(full.n_valid) // 2          # force truncation: all slots valid
        pp = pack_pairs(proj, pair_budget=budget, **kw)
        starts = np.asarray(pp.starts)[:-1]
        counts = np.asarray(pp.counts)[:-1]
        assert int(pp.n_valid) > budget          # genuinely overflowing
        assert (starts + counts).max() <= budget
        assert counts.sum() == budget

    def test_hq_tile_count_render(self, rng):
        """End-to-end forward at a tile count past the int32 fused-key limit
        (2064×1040 → 8385 tiles ≥ 2^13): the production path takes the
        two-key sort and matches the exact oracle."""
        W2, H2 = 2064, 1040
        assert (-(-W2 // 16)) * (-(-H2 // 16)) >= (1 << 13)
        n = 12
        means = (rng.randn(n, 3) * 0.4).astype(np.float32)
        # small enough that no rect hits the side-6 window (when clipping
        # kicks in, pallas and tiled legitimately anchor the truncated
        # window differently: tight extents vs 3σ rects)
        scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.2 - 4.2)
        rots = rng.randn(n, 4).astype(np.float32)
        opac = (1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)
        shs = rng.randn(n, 1, 3).astype(np.float32) * 0.3
        cam = make_camera(np.eye(3), np.array([0.0, 0, 3.0]), fx=1500, fy=1500,
                          cx=W2 / 2, cy=H2 / 2, width=W2, height=H2)
        proj = project_gaussians(
            jnp.asarray(means), cam.world_view_transform, cam.full_proj_transform,
            cam.camera_center, image_width=W2, image_height=H2,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            shs=jnp.asarray(shs), opacities=jnp.asarray(opac), sh_degree=0)
        bg = jnp.asarray([0.05, 0.1, 0.15])
        # tiled backend as oracle (identical rect math; see wide-rect test)
        from gaussian_garments_tpu.ops.tiled import rasterize_tiled
        it = rasterize_tiled(proj, image_height=H2, image_width=W2, bg=bg,
                             max_tiles_side=8, tile_capacity=64)
        ip, _, ap, aux = _forward(proj, bg, image_height=H2, image_width=W2,
                                  max_tiles_side=8, pair_budget=8192,
                                  interpret=True)
        assert int(aux["n_overflow"]) == 0
        assert int(aux["n_clipped"]) == 0
        np.testing.assert_allclose(np.asarray(ip), np.asarray(it[0]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(it[2]), atol=2e-6)


class TestPackedFeats:
    """bf16 hi/lo packed feature table (auto beyond ~190K splats; forced via
    ``feats_packed=True`` here so interpret-mode sizes stay test-tractable).
    hi/lo split ≈ 7.6e-6 relative on means/conic/depth; opacity/rgb single
    bf16 (≤0.4%) — tolerances reflect that."""

    def test_forward_matches_oracle(self, rng):
        means, scales, rots, opac, shs, cam = _scene(rng)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        bg = jnp.asarray([0.1, 0.2, 0.3])
        ir, dr, ar = rasterize_reference(proj, image_height=H, image_width=W, bg=bg)
        ip, dp, ap, aux = _forward(proj, bg, image_height=H, image_width=W,
                                   max_tiles_side=8, pair_budget=8192,
                                   interpret=True, feats_packed=True)
        np.testing.assert_allclose(np.asarray(ip), np.asarray(ir), atol=5e-3)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dr), atol=2e-2)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ar), atol=5e-3)
        assert int(aux["n_overflow"]) == 0

    def test_gradients_close_to_f32_path(self, rng):
        means, scales, rots, opac, shs, cam = _scene(rng, n=80)
        proj = _proj(cam, *(jnp.asarray(x) for x in (means, scales, rots, opac, shs)))
        bg = jnp.asarray([0.05, 0.1, 0.15])

        def loss(m2, conic, opc, rgb, packed):
            p = proj.replace(means2d=m2, conic=conic, opacity=opc, rgb=rgb)
            img, dep, alp, _ = rasterize_pallas(
                p, image_height=H, image_width=W, bg=bg, max_tiles_side=6,
                pair_budget=8192, interpret=True, feats_packed=packed)
            return (img * img).sum() + (dep * 0.05).sum() + (alp * 0.1).sum()

        args = (proj.means2d, proj.conic, proj.opacity, proj.rgb)
        g32 = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(*args)
        gbf = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(*args)
        for name, a, b in zip(("means2d", "conic", "opacity", "rgb"), g32, gbf):
            a = np.asarray(a)
            b = np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-2,
                                       err_msg=name)


def test_budget_bucket():
    from gaussian_garments_tpu.ops.pallas_tiles import budget_bucket

    assert budget_bucket(0) == 1 << 15                       # floor
    assert budget_bucket(40_000, headroom=1.5) == 65536      # need 60K -> 2^16
    assert budget_bucket(80_000, headroom=1.5) == 1 << 17    # need 120K -> 2^17
    assert budget_bucket(60_000, headroom=1.5) == 3 << 15    # need 90K -> 1.5*2^16
    assert budget_bucket(1_250_000, headroom=1.5) == 2_097_152  # need 1.875M -> 2^21
    assert budget_bucket(1_250_000, headroom=2.0) == 2_097_152  # capped
    assert budget_bucket(600_000, headroom=2.0) == 3 << 19   # need 1.2M -> 1.57M
    for c in (1, 1000, 123456, 999999):
        b = budget_bucket(c)
        assert b >= min(int(np.ceil(c * 1.5)), 2_097_152) or b == 2_097_152
