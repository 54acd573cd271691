"""Stage 3 — appearance training driver.

Same CLI surface and output layout as the reference ``s3_appearance.py``
(flags :51-73, forced overrides :81-86: epochs=5, eval/shuffle/random_bg/
blur_mask=True, seed 31359): epoch loop over all (sequence, frame, camera)
items training AvatarNet + the splat appearance, checkpointing to
``stage3/ckpt`` every ``--save_iterations`` and per epoch.

TPU redesign: items are grouped into batches of ``--items_per_step`` and fed
to the jitted step of ``gaussian_garments_tpu.training.s3`` (shard over the
device mesh when more than one chip is present).
"""
import os
import sys
from argparse import ArgumentParser, Namespace
from pathlib import Path

import numpy as np


def _save_debug_textures(net, state, bind, mesh_f, item, stage3_path, epoch, it):
    """[AO | object-space normal | |Δrgb| of the shadow net] texture panel
    (reference debug textures, s3_appearance.py:155-202)."""
    import numpy as np

    from gaussian_garments_tpu.models import mesh_gaussian as MG
    from gaussian_garments_tpu.utils.io import save_image

    frames = MG.compute_face_frames(item.mesh_v[0], mesh_f)
    out = net.apply({"params": state.net_params, "buffers": state.net_buffers},
                    item.ambient[0], item.normal[0], item.world_view[0],
                    item.campos[0], bind, item.mesh_v[0], mesh_f, frames)
    amb = np.repeat(np.asarray(item.ambient[0]), 3, axis=0)
    nrm = np.asarray(item.normal[0])
    drgb = np.abs(np.asarray(out[3:6]))
    drgb = drgb / max(drgb.max(), 1e-6)
    panel = np.concatenate([amb, nrm, drgb], axis=2).transpose(1, 2, 0)
    save_image(stage3_path / "debug" / f"e{epoch:02d}_i{it:06d}.png", panel)


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.config import DEFAULTS, OptimizationParams, PipelineParams
    from gaussian_garments_tpu.data.readers import AvatarDataset
    from gaussian_garments_tpu.models import avatar_gaussian as AG
    from gaussian_garments_tpu.models.avatar_net import AvatarNet
    from gaussian_garments_tpu.renderer import RasterConfig
    from gaussian_garments_tpu.training import s3 as S3
    from gaussian_garments_tpu.training.checkpoints import has_s3_ckpt, load_s3_ckpt, save_s3_ckpt
    from gaussian_garments_tpu.utils.io import read_obj

    parser = ArgumentParser(description="Training script parameters")
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("-s", "--subject", type=str, required=True, default="")
    parser.add_argument("-so", "--subject_out", type=str, default="")
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--texture_size", type=int, default=512)
    parser.add_argument("--texture_margin", type=int, default=5)
    parser.add_argument("--white_background", action="store_true", default=False)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--save_iterations", type=int, default=3000)
    parser.add_argument("--pre_train_iterations", type=int, default=3000)
    parser.add_argument("--lr_init", type=float, default=5e-4)
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--random_bg", action="store_true")
    parser.add_argument("--blur_mask", action="store_true")
    parser.add_argument("--llffhold", type=int, default=12)
    parser.add_argument("--items_per_step", type=int, default=1)
    parser.add_argument("--dense_texels", action="store_true",
                        help="dense res^2 texel layout with an alive mask: "
                             "texture gathers/scatters become reshapes "
                             "(faster on TPU when most texels are alive)")
    parser.add_argument("--unet_bf16", action="store_true",
                        help="bf16 UNet activations (f32 master params; "
                             "~5%% faster step — validate with the eval-"
                             "split PSNR before production use)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the item batch over the device mesh "
                             "(items_per_step must be a device-count multiple)")
    parser.add_argument("--eval_only", action="store_true",
                        help="load the checkpoint, run the held-out PSNR/SSIM "
                             "eval, print one EVAL_ONLY json line and exit "
                             "(used to measure the --unet_bf16 quality delta "
                             "on a trained model)")
    parser.add_argument("--eval_items", type=int, default=4,
                        help="held-out items rendered for PSNR/SSIM at save points")
    parser.add_argument("--ckpt_backend", type=str, default="pickle",
                        choices=("pickle", "orbax"),
                        help="orbax = sharding-aware + async saves overlapping "
                             "training (training/checkpoints.py)")
    args = parser.parse_args(sys.argv[1:])

    if len(args.subject_out) == 0:
        args.subject_out = args.subject
    args.subject_out = Path(DEFAULTS.output_root) / args.subject_out
    stage3_path = Path(args.subject_out) / DEFAULTS.stage3

    # reference hard-overrides (s3_appearance.py:81-90)
    args.debug = False
    args.epochs = 5
    args.eval = True
    args.shuffle = True
    args.random_bg = True
    args.blur_mask = True
    np.random.seed(31359)

    opt = op.extract(args)
    run_args = Namespace(**{**vars(opt), "lr_init": args.lr_init,
                            "only_foreground_loss": opt.only_foreground_loss})

    # UV binding + dataset
    template = read_obj(Path(args.subject_out) / DEFAULTS.stage1 / "template_uv.obj")
    bind, _ = AG.build_binding(template["uvs"], template["texture_faces"], args.texture_size,
                               dense=args.dense_texels)
    dataset = AvatarDataset(args, bind=bind)
    mesh_f = jnp.asarray(np.asarray(template["faces"], np.int64).astype(np.int32))

    # splats from the stage-2 Template (avatar_gaussian_model.py:69-138)
    tmpl_pc = Path(args.subject_out) / DEFAULTS.stage2 / "Template"
    splats, _ = AG.init_from_template(
        bind, template["vertices"], template["faces"],
        str(tmpl_pc / "point_cloud.ply"), str(tmpl_pc / "local_point_cloud.ply"),
        args.sh_degree)

    net = AvatarNet(texture_size=args.texture_size, sh_degree=args.sh_degree,
                    act_dtype=jnp.bfloat16 if args.unet_bf16 else jnp.float32)

    # per-item visibility cache: vis is a constant of the (seq, frame, cam)
    # item (the reference's dataloader ray-casts it per item load,
    # avatar_gaussian_model.py:227-263); computing it in-step costs ~12 ms
    # per item-iteration at 512². Stored packbits'd (32 KB/item).
    vis_cache = {}
    vis_fn = jax.jit(lambda mv, wv, fp: AG.get_visible_mask_depth(
        bind, mv, mesh_f, wv, fp, image_width=256, image_height=256))

    def item_vis(b) -> np.ndarray:
        c = b["camera"]
        key = (b["current_seq"], b["current_frame"], c.image_name)
        if key not in vis_cache:
            v = np.asarray(vis_fn(jnp.asarray(b["mesh_v"]),
                                  c.world_view_transform,
                                  c.full_proj_transform))
            vis_cache[key] = np.packbits(v)
        n = bind.binding.shape[0]
        return np.unpackbits(vis_cache[key], count=n).astype(np.float32)

    def make_item(batch):
        cams = [b["camera"] for b in batch]
        return S3.S3Item(
            vis=jnp.stack([jnp.asarray(item_vis(b)) for b in batch]),
            image=jnp.stack([c.original_image for c in cams]),
            mask=jnp.stack([c.gt_alpha_mask for c in cams]),
            bg=jnp.stack([jnp.asarray(b["bg"]) for b in batch]),
            mesh_v=jnp.stack([jnp.asarray(b["mesh_v"]) for b in batch]),
            ambient=jnp.stack([jnp.asarray(b["ambient"]) for b in batch]),
            normal=jnp.stack([jnp.asarray(b["normal"]) for b in batch]),
            world_view=jnp.stack([c.world_view_transform for c in cams]),
            full_proj=jnp.stack([c.full_proj_transform for c in cams]),
            campos=jnp.stack([c.camera_center for c in cams]),
            tanfovx=jnp.asarray([c.tanfovx for c in cams]),
            tanfovy=jnp.asarray([c.tanfovy for c in cams]),
            width=cams[0].image_width, height=cams[0].image_height,
        )

    first = make_item([dataset[0]])
    state = S3.init_state(net, bind, splats, template["vertices"], template["faces"], first)

    start_epoch = 1
    ckpt_dir = args.ckpt_path or stage3_path
    if has_s3_ckpt(ckpt_dir):
        ck = load_s3_ckpt(ckpt_dir)
        state = state.replace(net_params=ck["net_params"],
                              net_buffers=ck["net_buffers"],
                              splats=AG.adapt_params_layout(bind, ck["splats"]))
        start_epoch = ck["epoch"] + 1
        print(f"Resumed from epoch {ck['epoch']}")

    cfg = RasterConfig()
    b = args.items_per_step
    dp_mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from gaussian_garments_tpu.parallel import make_data_mesh
        dp_mesh = make_data_mesh()
        assert b % dp_mesh.size == 0, \
            f"--items_per_step {b} must be a multiple of {dp_mesh.size} devices"

    # pair_budget autosizing: at 512² texels the static 2M default makes every
    # pair-space op (sort, gather, backward segment-sum) ~20× the real pair
    # count. Probe a spread of items with the no-net geometry, 2× headroom
    # (the net's Δxyz hinge + opacity drift), {2^k, 1.5·2^k} bucket, grow-only
    # across epochs.
    pair_counter = S3.make_s3_pair_counter(raster_cfg=cfg)

    def probe_pair_budget() -> int:
        n = min(8, len(dataset))
        mx = 1
        for j in range(n):
            it_ = make_item([dataset[(j * len(dataset)) // n]])
            mx = max(mx, int(np.asarray(
                pair_counter(state, bind, mesh_f, it_)).max()))
        from gaussian_garments_tpu.ops.pallas_tiles import budget_bucket
        return budget_bucket(mx, headroom=2.0, cap=cfg.pair_budget)

    def build_step(train_gaussians, step_cfg):
        if dp_mesh is None:
            return S3.make_s3_step(net, run_args, sh_degree=args.sh_degree,
                                   raster_cfg=step_cfg, train_gaussians=train_gaussians)
        from gaussian_garments_tpu.parallel import shard_step
        raw = S3.make_s3_step(net, run_args, sh_degree=args.sh_degree,
                              raster_cfg=step_cfg, train_gaussians=train_gaussians,
                              axis_name="data", jit=False)
        return shard_step(raw, dp_mesh,
                          in_specs=(None, None, None, "data"),
                          out_specs=(None, None))

    steps = {}   # pair_budget -> (step_pre, step_full, eval_fn)

    def get_steps(budget):
        if budget not in steps:
            step_cfg = cfg.replace(pair_budget=budget)
            print(f"[s3] building steps at pair_budget {budget}")
            steps[budget] = (build_step(False, step_cfg),
                             build_step(True, step_cfg),
                             S3.make_s3_eval(net, sh_degree=args.sh_degree,
                                             raster_cfg=step_cfg))
        return steps[budget]

    pair_budget = probe_pair_budget()
    step_pre, step_full, eval_fn = get_steps(pair_budget)

    from gaussian_garments_tpu.utils.logging import MetricLogger
    from gaussian_garments_tpu.utils.quality import image_metrics
    metrics_log = MetricLogger(str(stage3_path / "logs" / "train.jsonl"))

    def eval_quality():
        """PSNR/SSIM on held-out llffhold items (quality-parity harness)."""
        n = min(args.eval_items, len(dataset.eval_collection))
        if n == 0:
            return {}
        acc = {}
        for j in range(n):
            it_ = make_item([dataset.eval_item(j)])
            img = eval_fn(state, bind, mesh_f, it_)[0]
            for k, v in image_metrics(img, it_.image[0], it_.mask[0]).items():
                acc[k] = acc.get(k, 0.0) + v
        return {f"eval_{k}": v / n for k, v in acc.items()}

    if args.eval_only:
        import json as _json
        q = eval_quality()
        print("EVAL_ONLY " + _json.dumps(
            {k: round(float(v), 4) for k, v in q.items()}), flush=True)
        metrics_log.close()
        return

    global_it = 0
    for epoch in range(start_epoch, args.epochs + 1):
        # per-epoch reshuffle (reference DataLoader(shuffle=True), s3:99)
        dataset.reshuffle(epoch)
        # re-probe the pair budget (training moves opacity/xyz); grow-only
        new_budget = max(pair_budget, probe_pair_budget())
        if new_budget != pair_budget:
            pair_budget = new_budget
            step_pre, step_full, eval_fn = get_steps(pair_budget)
        for it in range(0, len(dataset), b):
            batch = [dataset[j % len(dataset)] for j in range(it, it + b)]
            item = make_item(batch)
            pretrain = epoch == 1 and it < args.pre_train_iterations
            step = step_pre if pretrain else step_full
            state, loss_dict = step(state, bind, mesh_f, item)
            global_it += 1
            if it % 100 == 0:
                print(f"[epoch {epoch} iter {it}/{len(dataset)}] "
                      + " ".join(f"{k}={float(v):.5f}" for k, v in loss_dict.items()))
                metrics_log.log(global_it,
                                {k: float(v) for k, v in loss_dict.items()},
                                epoch=epoch)
            # debug texture panels every save_iterations/5 items
            # (reference s3_appearance.py:155-202)
            if it % max(args.save_iterations // 5, 1) == 0:
                _save_debug_textures(net, state, bind, mesh_f, item, stage3_path,
                                     epoch, it)
            if it > 0 and it % args.save_iterations == 0:
                # mid-epoch saves are async under orbax: the write overlaps
                # the next training steps
                save_s3_ckpt(stage3_path, state, epoch,
                             active_sh_degree=args.sh_degree,
                             backend=args.ckpt_backend,
                             async_save=args.ckpt_backend == "orbax")
                q = eval_quality()
                if q:
                    metrics_log.log(global_it, q, epoch=epoch)
                    print(f"[epoch {epoch}] " + " ".join(f"{k}={v:.3f}" for k, v in q.items()))
        save_s3_ckpt(stage3_path, state, epoch,
                     active_sh_degree=args.sh_degree, backend=args.ckpt_backend)
        q = eval_quality()
        if q:
            metrics_log.log(global_it, q, epoch=epoch)
            print(f"[epoch {epoch}] " + " ".join(f"{k}={v:.3f}" for k, v in q.items()))
    metrics_log.close()
    if args.ckpt_backend == "orbax":
        from gaussian_garments_tpu.training.checkpoints import wait_for_saves
        wait_for_saves()

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
