"""Compute ops for the TPU-native Gaussian splatting renderer.

Layout (replaces the reference's external CUDA package
``diff_gaussian_rasterization_depth_alpha``, see
``/root/reference/gaussian_renderer/__init__.py:16``):

- ``projection``: EWA projection of 3D Gaussians to screen-space conics
  (the per-splat preprocessing the CUDA kernel does in ``preprocessCUDA``).
- ``rasterizer_ref``: exact per-pixel compositor in pure jnp — the
  correctness oracle for kernel tests (small scenes only).
- ``tiled``: the production sort-based tiled compositor (XLA path).
- ``pallas_tiles``: Pallas TPU kernel for the per-tile compositing hot loop.
- ``knn``: squared distance to nearest neighbors (replaces ``simple_knn``).
"""
from gaussian_garments_tpu.ops.projection import ProjectedGaussians, project_gaussians
from gaussian_garments_tpu.ops.rasterizer_ref import rasterize_reference
from gaussian_garments_tpu.ops.tiled import rasterize_tiled
from gaussian_garments_tpu.ops.pallas_tiles import rasterize_pallas
