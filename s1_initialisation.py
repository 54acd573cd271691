"""Stage 1 — geometry initialisation driver.

Same CLI surface as the reference ``s1_initialisation.py`` (:7-35): export
the template frame for COLMAP, run the COLMAP MVS chain, and post-process the
fused cloud into a garment template mesh. The UV unwrap remains a manual
Blender step (README.md:73).
"""
import sys
from argparse import ArgumentParser
from pathlib import Path


def initialization_parser():
    parser = ArgumentParser(description="Initialisation script parameters")
    parser.add_argument("-s", "--subject", type=str, required=True)
    parser.add_argument("-so", "--subject_out", type=str, default="")
    parser.add_argument("-q", "--sequence", type=str, required=True)
    parser.add_argument("-tf", "--template_frame", type=int, default=0)
    parser.add_argument("--camera", default="PINHOLE", type=str)
    parser.add_argument("--gpu", action="store_true")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--overwrite", action="store_true")
    # TPU-build additions (no reference analogue): skip the COLMAP chain when
    # a fused.ply already exists; meshing resolution/budget knobs exposed for
    # small scenes and tests (reference hardcodes depth 13 / 8000 faces)
    parser.add_argument("--skip_colmap", action="store_true")
    parser.add_argument("--no_segmentation", action="store_true",
                        help="skip garment-mask segmentation (whole scan)")
    parser.add_argument("--grid_res", type=int, default=None)
    parser.add_argument("--remesh_faces", type=int, default=8000)
    return parser


def main():
    from gaussian_garments_tpu.config import DEFAULTS
    from gaussian_garments_tpu.stages.s1 import (
        colmap_recon, load_segmentation_inputs, post_process, prepare_dataset)

    args = initialization_parser().parse_args(sys.argv[1:])
    if len(args.subject_out) == 0:
        args.subject_out = args.subject

    source_root = Path(DEFAULTS.data_root) / args.subject / args.sequence
    target_root = Path(DEFAULTS.output_root) / args.subject_out / DEFAULTS.stage1

    prepare_dataset(source_root, target_root, args.camera,
                    template_frame=args.template_frame, overwrite=args.overwrite)
    if not args.skip_colmap:
        colmap_recon(target_root, gpu=args.gpu)
    # the reference ALWAYS segments the scan against the garment masks
    # (utils/initialisation_utils.py:152-156 → utils/parse_scan.py:53-119);
    # load the cameras + masks prepare_dataset exported and pass them through
    cameras, masks = (None, None) if args.no_segmentation \
        else load_segmentation_inputs(target_root)
    if cameras is None and not args.no_segmentation:
        print("[stage1] WARNING: no masks/cameras found under the target "
              "root; emitting an UNSEGMENTED template")
    post_process(target_root, target_root, cameras=cameras,
                 garment_masks=masks, grid_res=args.grid_res,
                 remesh_faces=args.remesh_faces)
    print("Stage 1 complete. UV-unwrap template.obj to template_uv.obj "
          "(manual Blender step, README.md:73).")


if __name__ == "__main__":
    main()
