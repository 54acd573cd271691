"""Configuration / flag system.

Mirrors the reference ``arguments/__init__.py`` (ParamGroup reflection ->
argparse, leading underscore = one-letter shorthand) and ``utils/defaults.py``
(DEFAULTS path registry), with the same flag names and default values, so that
command lines written for the reference work unchanged against our stage
scripts.

Reference: arguments/__init__.py:19-120, utils/defaults.py:6-26.
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser, Namespace
from types import SimpleNamespace


class _Defaults(SimpleNamespace):
    pass


def _make_defaults() -> _Defaults:
    d = _Defaults()
    d.output_root = os.environ.get("GG_OUTPUT_ROOT", "./output")
    d.data_root = os.environ.get("GG_DATA_ROOT", "./data")
    d.aux_root = os.environ.get("GG_AUX_ROOT", "./aux")
    d.stage1 = "stage1"
    d.stage2 = "stage2"
    d.stage3 = "stage3"
    d.rgb_images = "rgb_images"
    d.garment_masks = "garment_masks"
    d.foreground_masks = "foreground_masks"
    d.temp_folder = os.environ.get("GG_TEMP_FOLDER", "/tmp/gg_tpu")
    return d


DEFAULTS = _make_defaults()


class GroupParams:
    pass


class ParamGroup:
    """Reflective flag group: every attribute becomes ``--name`` (leading
    underscore also adds the one-letter shorthand)."""

    def __init__(self, parser: ArgumentParser, name: str, fill_none: bool = False):
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = False
            if key.startswith("_"):
                shorthand = True
                key = key[1:]
            t = type(value)
            value = value if not fill_none else None
            if shorthand:
                if t == bool:
                    group.add_argument("--" + key, ("-" + key[0:1]), default=value, action="store_true")
                else:
                    group.add_argument("--" + key, ("-" + key[0:1]), default=value, type=t)
            else:
                if t == bool:
                    group.add_argument("--" + key, default=value, action="store_true")
                elif t == list:
                    group.add_argument("--" + key, default=value, nargs="*")
                else:
                    group.add_argument("--" + key, default=value, type=t)

    def extract(self, args):
        group = GroupParams()
        for k, v in vars(args).items():
            if k in vars(self) or ("_" + k) in vars(self):
                setattr(group, k, v)
        return group


class ModelParams(ParamGroup):
    def __init__(self, parser, sentinel=False):
        self.sh_degree = 3
        self._resolution = -1
        self._white_background = False
        self.data_device = "tpu"
        self.eval = False
        self.llffhold = 12
        super().__init__(parser, "Loading Parameters", sentinel)


class PipelineParams(ParamGroup):
    def __init__(self, parser):
        self.convert_SHs_python = False
        self.compute_cov3D_python = False
        self.debug = False
        self.switch_to_D3G = False
        super().__init__(parser, "Pipeline Parameters")


class OptimizationParams(ParamGroup):
    def __init__(self, parser):
        self.iterations = None
        self.opt_opacity_from = None
        self.opt_mesh_from = None
        self.position_lr_init = 0.00016
        self.position_lr_final = 0.0000016
        self.position_lr_delay_mult = 0.01
        self.position_lr_max_steps = 30_000
        self.feature_lr = 0.0025
        self.opacity_lr = 0.05
        self.scaling_lr = 0.005
        self.rotation_lr = 0.001
        self.percent_dense = 0.01
        self.lambda_dssim = 0.2
        self.lambda_xyz = 1e-2
        self.threshold_xyz = 1.0
        self.lambda_scale = 1.0
        self.threshold_scale = 0.6
        self.recon_scale_threshold = 0.005
        self.lambda_color = 0.01
        self.lambda_bending = 0.03
        self.lambda_stretching = 0.01
        self.lambda_d3g = 0.001
        self.lambda_virtual = 0.05
        self.lambda_shs = 0.2
        self.threshold_opacity = 0.75
        self.lambda_opacity = 0.01
        self.lambda_inertial = 0.0
        self.lambda_gravity = 0.0
        self.lambda_collision = 1e3

        self.densification_interval = 100
        self.opacity_reset_interval = 3000
        self.densify_from_iter = 500
        self.densify_until_iter = 15_000
        self.densify_grad_threshold = 0.0002
        self.random_background = False

        self.only_foreground_loss = True
        super().__init__(parser, "Optimization Parameters")


class GaussianClothParams(ParamGroup):
    def __init__(self, parser):
        super().__init__(parser, "GaussianCloth Parameters")


def get_combined_args(parser: ArgumentParser):
    """Merge CLI args with a saved ``cfg_args`` namespace dump
    (reference ``arguments/__init__.py:122-142``)."""
    cmdline_string = sys.argv[1:]
    cfgfile_string = "Namespace()"
    args_cmdline = parser.parse_args(cmdline_string)

    try:
        cfgfilepath = os.path.join(args_cmdline.subject_out, "cfg_args")
        with open(cfgfilepath) as cfg_file:
            cfgfile_string = cfg_file.read()
    except (TypeError, FileNotFoundError):
        pass
    args_cfgfile = eval(cfgfile_string)  # noqa: S307 - reference 3DGS convention

    merged_dict = vars(args_cfgfile).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged_dict[k] = v
    return Namespace(**merged_dict)
