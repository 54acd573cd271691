"""Gaussian-Garments TPU: a TPU-native (JAX/XLA/Pallas) reimplementation of the
Gaussian-Garments pipeline (reconstruction of simulation-ready clothing with
photorealistic appearance from multi-view video).

The framework mirrors the capabilities of the reference CUDA/PyTorch pipeline
(see /root/reference) while being designed TPU-first:

- the differentiable 3D Gaussian splatting renderer is a tiled, sort-based
  compositor (``ops.rasterizer``) instead of an atomics-based CUDA kernel;
- models are immutable parameter pytrees transformed with ``jax.jit``/``grad``;
- multi-camera batches shard over a ``jax.sharding.Mesh`` with psum gradient
  reduction (``parallel``).
"""

__version__ = "0.1.0"
