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
    return parser


def main():
    from gaussian_garments_tpu.config import DEFAULTS
    from gaussian_garments_tpu.stages.s1 import colmap_recon, post_process, prepare_dataset

    args = initialization_parser().parse_args(sys.argv[1:])
    if len(args.subject_out) == 0:
        args.subject_out = args.subject

    source_root = Path(DEFAULTS.data_root) / args.subject / args.sequence
    target_root = Path(DEFAULTS.output_root) / args.subject_out / DEFAULTS.stage1

    prepare_dataset(source_root, target_root, args.camera,
                    template_frame=args.template_frame, overwrite=args.overwrite)
    colmap_recon(target_root, gpu=args.gpu)
    post_process(target_root, target_root)
    print("Stage 1 complete. UV-unwrap template.obj to template_uv.obj "
          "(manual Blender step, README.md:73).")


if __name__ == "__main__":
    main()
