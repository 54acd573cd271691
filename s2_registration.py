"""Stage 2 — garment registration (mesh tracking) driver.

Same CLI surface and output layout as the reference ``s2_registration.py``:
template mode (``-tf`` set) runs one frame with
``first_frame_iterations + ff_collision_iteration`` two-phase optimization;
sequence mode tracks every frame with warm starts. Per-frame artifacts:
``point_cloud/frame_%05d/{local_point_cloud.ply, point_cloud.ply}`` +
``binding.pkl``, ``meshes/frame_%05d.obj``, ``cameras.json``, ``cfg_args``.

TPU redesign: the inner loop is the jitted step of
``gaussian_garments_tpu.training.s2`` with a k-camera batch per step
(``--cameras_per_step``, default 1 to match the reference's sampling), sharded
over all local devices when more than one is present.
"""
import os
import random
import sys
from argparse import ArgumentParser, Namespace
from pathlib import Path

import numpy as np


def prepare_output_and_logger(args):
    os.makedirs(args.subject_out, exist_ok=True)
    stage2 = Path(args.subject_out) / "stage2" / args.sequence
    os.makedirs(stage2, exist_ok=True)
    with open(stage2 / "cfg_args", "w") as f:
        f.write(str(Namespace(**vars(args))))


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_garments_tpu.config import DEFAULTS, ModelParams, OptimizationParams, PipelineParams
    from gaussian_garments_tpu.data.readers import FrameDataloader
    from gaussian_garments_tpu.models import gaussian as G
    from gaussian_garments_tpu.models import mesh_gaussian as MG
    from gaussian_garments_tpu.models import mesh_model as MM
    from gaussian_garments_tpu.renderer import BatchedCameras, RasterConfig
    from gaussian_garments_tpu.scene import CrossScene, Scene
    from gaussian_garments_tpu.training import s2 as S2
    from gaussian_garments_tpu.utils.general import get_expon_lr_func
    from gaussian_garments_tpu.utils.io import read_obj, fetch_ply, store_ply, write_obj

    parser = ArgumentParser(description="Training script parameters")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)

    parser.add_argument("-s", "--subject", type=str, required=True, default="")
    parser.add_argument("-so", "--subject_out", type=str, default="")
    parser.add_argument("-t", "--template_seq", type=str, default="")
    parser.add_argument("-q", "--sequence", type=str, required=True, default="")
    parser.add_argument("-tf", "--template_frame", type=int, default=None)
    parser.add_argument("--first_frame_iterations", type=int, default=10000)
    parser.add_argument("--first_frame_iterations_cross", type=int, default=15000)
    parser.add_argument("--other_frame_iterations", type=int, default=5000)
    parser.add_argument("--collision_iteration", type=int, default=2000)
    parser.add_argument("--ff_collision_iteration", type=int, default=2000)
    parser.add_argument("--start_from", type=int, default=-1)
    parser.add_argument("--use_icp", action="store_true")
    parser.add_argument("--camera", default="PINHOLE", type=str)
    # TPU additions. Defaults tuned for registered-frames/hour on TPU
    # (BASELINE.json north star); reference-equivalent sampling is
    # ``--cameras_per_step 1 --early_stop_rel 0`` (PARITY.md "TPU defaults").
    parser.add_argument("--cameras_per_step", type=int, default=4,
                        help="cameras consumed per jitted step (the reference "
                             "samples 1/iteration; 4 keeps the MXU fed)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the camera batch over all local devices "
                             "(cameras_per_step must be a multiple of the device count)")
    parser.add_argument("--early_stop_rel", type=float, default=5e-4,
                        help="sequence-frame plateau early-stop: end the phase "
                             "when the windowed total loss improves by less "
                             "than this relative amount; 0 disables")
    parser.add_argument("--early_stop_window", type=int, default=200,
                        help="iterations per plateau-detection window")
    parser.add_argument("--debug_nan", action="store_true",
                        help="check loss finiteness every iteration; on the "
                             "first NaN dump the pre-step state + camera batch "
                             "to <stage2>/nan_dump.pkl and abort (costs one "
                             "host sync per iteration)")
    args = parser.parse_args(sys.argv[1:])

    args.sh_degree = 0      # reference hard-override (s2_registration.py:158)
    args.debug = False
    if len(args.subject_out) == 0:
        args.subject_out = args.subject
    args.subject_out = Path(DEFAULTS.output_root) / args.subject_out

    args.is_template = args.template_frame is not None
    args.is_template_seq = args.is_template
    if not args.is_template_seq:
        args.first_frame_iterations = args.first_frame_iterations_cross
        args.cross_from = Path(DEFAULTS.output_root) / args.subject_out / DEFAULTS.stage2 / args.template_seq

    prepare_output_and_logger(args)
    opt = op.extract(args)

    dataloader = FrameDataloader(args)

    # template mesh + dense point cloud colors (mesh_gaussian_model.py:48-72)
    template_path = Path(args.subject_out) / DEFAULTS.stage1 / "template_uv.obj"
    tem = read_obj(template_path)
    pc_path = Path(args.subject_out) / DEFAULTS.stage1 / "point_cloud.ply"
    centers = tem["vertices"][tem["faces"]].mean(1)
    if pc_path.exists():
        from scipy.spatial import cKDTree
        pc = fetch_ply(pc_path)
        _, nb = cKDTree(pc.points).query(centers)
        colors = pc.colors[nb]
    else:
        colors = np.full((len(centers), 3), 0.5, np.float32)
    stage2_path = Path(args.subject_out) / DEFAULTS.stage2 / args.sequence
    os.makedirs(stage2_path, exist_ok=True)
    store_ply(stage2_path / "input.ply", centers, colors * 255)

    # SMPL-X hand vertex exclusion list (mesh_gaussian_model.py:76-78)
    hand_list = np.zeros(0, np.int64)
    hand_json = Path(DEFAULTS.aux_root) / "smplx" / "smplx_vert_segmentation.json"
    if hand_json.exists():
        import json
        seg = json.load(open(hand_json))
        hand_list = np.array([v for k, verts in seg.items() for v in verts if "hand" in k.lower()])

    scene_cls = Scene if args.is_template else CrossScene
    scene = scene_cls(args, dataloader, hand_list)

    mesh = MM.create(tem["vertices"], tem["faces"])
    cfg = RasterConfig()
    bg_color = jnp.asarray([1.0, 1, 1] if args.white_background else [0.0, 0, 0])

    frames_iterator = range(len(dataloader)) if not args.is_template else [args.template_frame]
    rng = random.Random(0)
    densify_rng = np.random.RandomState(0)  # advances across densifications

    binding_counter = np.ones(len(tem["faces"]), np.int32)
    state = None

    # step/probe caches live ACROSS frames: sequence frames share splat
    # capacity and pair-budget bucket, so re-tracing per frame (the old
    # per-frame dict) wasted seconds of host time every frame
    steps = {}
    pair_counter = S2.make_pair_counter(0, cfg)  # jit retraces per capacity

    def autosize_budget(n_pairs_max: int) -> int:
        """pair_budget bucket: smallest {2^k, 1.5·2^k} ≥ 1.5× the measured
        per-camera max, floor 32K, capped at the configured budget. Every
        pair-space op (sort, feature gather, backward segment-sum) costs the
        STATIC budget, not the real pair count — at production s2 scale
        (~35K pairs/cam vs n·side²≈286K slots) autosizing cuts the step ~25%
        (MEASUREMENTS.md). Pow2 quantization bounds recompiles."""
        from gaussian_garments_tpu.ops.pallas_tiles import budget_bucket
        return budget_bucket(int(n_pairs_max), headroom=1.5,
                             cap=cfg.pair_budget)

    def probe_pair_budget(state, cams) -> int:
        probe = BatchedCameras.from_cameras(cams, include_images=False)
        counts = np.asarray(pair_counter(state, probe))
        return autosize_budget(counts.max())

    for t in frames_iterator:
        if args.start_from > 0 and t < args.start_from:
            continue
        is_ff = (t == 0) or args.is_template
        collision_iteration = args.ff_collision_iteration if is_ff else args.collision_iteration
        iterations = (args.first_frame_iterations + collision_iteration) if is_ff \
            else args.other_frame_iterations

        train_cams, test_cams = scene.prepare_frame_cameras(t)

        if is_ff and args.is_template_seq:
            params, aux, binding, binding_counter = MG.create_from_template(
                tem["vertices"], tem["faces"], colors, max_sh_degree=args.sh_degree)
            state = S2.init_state(params, aux, binding, mesh)
            scene.save_cam = True
            from gaussian_garments_tpu.scene import store_cam
            store_cam(dataloader.cam_info, stage2_path)
            state = state.replace(mesh=scene.setup_body(state.mesh, t))
        else:
            # sequence mode: reload Template gaussians every frame (cross_scene.py:67-70)
            tmpl_ply = Path(args.subject_out) / DEFAULTS.stage2 / "Template" / "local_point_cloud.ply"
            params, aux = G.load_ply(str(tmpl_ply), args.sh_degree)
            import pickle
            with open(tmpl_ply.parent / "binding.pkl", "rb") as f:
                binding = np.asarray(pickle.load(f))
            if state is None:
                state = S2.init_state(params, aux, binding, mesh)
            else:
                state = S2.init_state(params, aux, binding, state.mesh)
            if not is_ff:
                state = state.replace(mesh=scene.warm_start(state.mesh, t))
                state = state.replace(mesh=scene.setup_body(state.mesh, t, bind_frame=t - 1))
            else:
                state = state.replace(mesh=scene.setup_body(state.mesh, t))

        spatial_lr_scale = scene.cameras_extent
        xyz_sched = get_expon_lr_func(
            lr_init=opt.position_lr_init * spatial_lr_scale,
            lr_final=opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps)
        vert_lr = opt.position_lr_init * spatial_lr_scale

        b = args.cameras_per_step
        dp_mesh = None
        if args.data_parallel and jax.device_count() > 1:
            from gaussian_garments_tpu.parallel import make_data_mesh
            dp_mesh = make_data_mesh()
            assert b % dp_mesh.size == 0, \
                f"--cameras_per_step {b} must be a multiple of {dp_mesh.size} devices"

        # pair-budget bucket for this frame: probed from the real scene, grown
        # on densification and on observed overflow, never shrunk mid-frame
        pair_budget = probe_pair_budget(state, train_cams)

        def get_step(mode, use_body):
            # keyed on splat CAPACITY (densification growth re-traces the
            # step) and the pair-budget bucket. Each trace is logged with its
            # wall time so recompile overhead is visible in the JSONL metrics
            # (reference has no such cost — dynamic tensors)
            key = (mode, use_body, state.params.xyz.shape[0], pair_budget)
            if key not in steps:
                import time as _time
                t_trace = _time.perf_counter()
                frame_cfg = cfg.replace(pair_budget=pair_budget)
                if dp_mesh is not None:
                    from gaussian_garments_tpu.parallel import shard_step
                    raw = S2.make_s2_step(opt, mode=mode, use_body=use_body,
                                          active_sh_degree=0, raster_cfg=frame_cfg,
                                          axis_name="data", jit=False)
                    steps[key] = shard_step(
                        raw, dp_mesh,
                        in_specs=(None, "data", None, None, None),
                        out_specs=(None, None, None))
                else:
                    steps[key] = S2.make_s2_step(opt, mode=mode, use_body=use_body,
                                                 active_sh_degree=0, raster_cfg=frame_cfg)
                build_s = _time.perf_counter() - t_trace
                print(f"[frame {t}] new step variant {key} (capacity "
                      f"{key[2]}, pair_budget {pair_budget}); build "
                      f"{build_s:.2f}s (compile follows on first call)")
                metrics_log.log(it, {}, compile_event=str(key),
                                build_s=round(build_s, 3))
            return steps[key]

        from gaussian_garments_tpu.utils.logging import MetricLogger, StepTimer
        metrics_log = MetricLogger(str(stage2_path / "logs" / f"frame_{t:05d}.jsonl"))
        timer = StepTimer()
        viewpoint_stack = []
        # plateau early-stop (sequence frames only): warm starts mean most
        # frames converge well before other_frame_iterations; sample the total
        # loss sparsely (device syncs are ~ms through the tunnel) and compare
        # windowed averages. On plateau: skip ahead to the collision phase if
        # it hasn't run yet, else end the frame.
        plateau_on = (args.early_stop_rel > 0) and not is_ff
        check_every = 25
        hist, prev_avg = [], None
        it = 0
        while it < iterations:
            it += 1
            use_body = it > iterations - collision_iteration
            if args.is_template_seq:
                mode = "template_p2" if (is_ff and use_body) else "template_p1"
            else:
                mode = "seq"
            picked = []
            while len(picked) < b:
                if not viewpoint_stack:
                    viewpoint_stack = list(train_cams)
                picked.append(viewpoint_stack.pop(rng.randint(0, len(viewpoint_stack) - 1)))
            batch = BatchedCameras.from_cameras(picked)
            bg = jnp.asarray(np.random.rand(3).astype(np.float32)) if opt.random_background else bg_color

            step = get_step(mode, use_body)
            xyz_lr = float(xyz_sched(it)) if (args.is_template_seq and is_ff) else \
                opt.position_lr_init * spatial_lr_scale
            if args.debug_nan:
                prev_state = jax.tree.map(np.asarray, state)
            with timer.phase("step"):
                state, loss_dict, metrics = step(state, batch, bg, xyz_lr, vert_lr)
            if args.debug_nan and (
                    not all(np.isfinite(float(v)) for v in loss_dict.values())
                    or not np.isfinite(np.asarray(state.mesh.v)).all()):
                import pickle
                dump = {"state": prev_state,
                        "batch": jax.tree.map(np.asarray, batch),
                        "bg": np.asarray(bg), "xyz_lr": xyz_lr, "vert_lr": vert_lr,
                        "mode": mode, "use_body": use_body, "iter": it,
                        "loss_dict": {k: float(v) for k, v in loss_dict.items()}}
                with open(stage2_path / "nan_dump.pkl", "wb") as f:
                    pickle.dump(dump, f)
                raise FloatingPointError(
                    f"NaN loss at frame {t} iter {it}: {dump['loss_dict']} "
                    f"(pre-step state dumped to {stage2_path / 'nan_dump.pkl'})")

            # densify / prune / opacity reset (template phase 1 only)
            if args.is_template_seq and is_ff and not use_body:
                if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                    size_threshold = 20 if it > opt.opacity_reset_interval else None
                    state, binding_counter, stats = S2.densify_and_prune_state(
                        state, opt, scene.cameras_extent, size_threshold, binding_counter,
                        rng=densify_rng)
                    # densification adds pairs: re-probe, grow-only (the
                    # state sync above already paid the host round-trip)
                    pair_budget = max(pair_budget,
                                      probe_pair_budget(state, train_cams))
                if it % opt.opacity_reset_interval == 0 or \
                        (args.white_background and it == opt.densify_from_iter):
                    state = S2.reset_opacity_state(state)

            if it % 100 == 0 or it == iterations:
                n_overflow = float(metrics["n_overflow"])
                metrics_log.log(it, {k: float(v) for k, v in loss_dict.items()},
                                n_splats=float(state.aux.alive.sum()),
                                radii_max=float(metrics["radii_max"]),
                                n_overflow=n_overflow,
                                step_s=timer.avg.get("step", 0.0))
                if n_overflow > 0 and pair_budget < cfg.pair_budget:
                    # autosized budget undersized (pairs were dropped):
                    # double the bucket; next get_step() rebuilds
                    pair_budget = min(pair_budget * 2, cfg.pair_budget)
                    print(f"[frame {t} iter {it}] pair overflow "
                          f"({int(n_overflow)}); pair_budget -> {pair_budget}")
            if it % 500 == 0 or it == iterations:
                print(f"[frame {t} iter {it}/{iterations}] "
                      + " ".join(f"{k}={float(v):.5f}" for k, v in loss_dict.items()))

            if plateau_on and it % check_every == 0:
                hist.append(sum(float(v) for v in loss_dict.values()))
                if len(hist) * check_every >= args.early_stop_window:
                    avg, hist = float(np.mean(hist)), []
                    flat = prev_avg is not None and \
                        (prev_avg - avg) < args.early_stop_rel * abs(prev_avg)
                    prev_avg = avg
                    if flat:
                        body_start = iterations - collision_iteration
                        if not use_body and it < body_start and collision_iteration > 0:
                            print(f"[frame {t}] plateau at iter {it}; "
                                  f"skipping to collision phase ({body_start})")
                            it = body_start
                            prev_avg = None   # loss scale changes with body terms
                        else:
                            print(f"[frame {t}] plateau at iter {it}; early stop")
                            break

        # save artifacts: template mode writes Template/template.obj +
        # template_render.png; sequence mode meshes/frame_%05d.obj +
        # renders/%05d.png (reference saver, s2_registration.py:88-96,117-119)
        frames = MG.compute_face_frames(state.mesh.v, state.mesh.f)
        scene.save(t, state.params, state.aux, np.asarray(state.binding), frames,
                   template=args.is_template)
        if args.is_template:
            template_dir = Path(args.subject_out) / DEFAULTS.stage2 / "Template"
            os.makedirs(template_dir, exist_ok=True)
            out_mesh = dict(tem)
            out_mesh["vertices"] = np.asarray(state.mesh.v)
            write_obj(out_mesh, template_dir / "template.obj")
            panel_path = template_dir / "template_render.png"
        else:
            panel_path = stage2_path / "renders" / f"{t:05d}.png"
        scene.save_mesh(t, tem, np.asarray(state.mesh.v))

        # debug render panel: GT | penalized mask | render | abs-diff |
        # shaded mesh+body (reference saver, s2_registration.py:98-122; the
        # mesh column is its aitviewer composite :110-113)
        from gaussian_garments_tpu.renderer import SplatBundle, render as render_one
        from gaussian_garments_tpu.models import gaussian as GM
        from gaussian_garments_tpu.utils.logging import debug_panel, shaded_mesh_image
        cam0 = train_cams[0]
        bundle = SplatBundle(
            means3d=MG.world_xyz(state.params, state.binding, frames),
            opacity=GM.get_opacity(state.params) * state.aux.alive[:, None],
            scales=MG.world_scaling(state.params, state.binding, frames),
            rotations=MG.world_rotation(state.params, state.binding, frames),
            shs=GM.get_features(state.params), active_sh_degree=0)
        out_img = render_one(cam0, bundle, bg_color, config=cfg)["render"]
        body_vf = scene.body_for_frame(t)
        mesh_img = shaded_mesh_image(
            np.asarray(state.mesh.v), np.asarray(state.mesh.f), cam0,
            body_v=body_vf[0] if body_vf else None,
            body_f=body_vf[1] if body_vf else None)
        debug_panel(np.asarray(cam0.original_image), np.asarray(cam0.gt_alpha_mask),
                    np.asarray(out_img), mesh_render=mesh_img,
                    path=str(panel_path))

        # quality parity: PSNR/SSIM on the llffhold eval split (and a train
        # probe) at the save point — BASELINE.md's ≤0.1 dB target needs
        # numbers, not just panels
        from gaussian_garments_tpu.utils.quality import evaluate_cameras
        _render = lambda c: render_one(c, bundle, bg_color, config=cfg)["render"]
        q_train = evaluate_cameras(train_cams, _render, max_cams=4)
        q_test = evaluate_cameras(test_cams, _render, max_cams=8)
        quality = {**{f"train_{k}": v for k, v in q_train.items()},
                   **{f"test_{k}": v for k, v in q_test.items()}}
        metrics_log.log(iterations, quality, frame=t)
        print(f"[frame {t}] quality: "
              + " ".join(f"{k}={v:.3f}" for k, v in quality.items()))
        xyz = np.asarray(MG.world_xyz(state.params, state.binding, frames))
        rot = np.asarray(MG.world_rotation(state.params, state.binding, frames))
        scene.post_each_frame(is_ff, xyz, rot, tem["vertices"], tem["faces"],
                              np.asarray(state.binding))
        metrics_log.close()

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
