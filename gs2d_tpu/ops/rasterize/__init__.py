"""Differentiable 2D-Gaussian-surfel rasterizer (TPU-native).

Re-designs the capability of the reference CUDA submodule
``diff-surfel-rasterization`` (API contract documented at
/root/reference/gaussian_renderer/__init__.py:37-139 and SURVEY.md §2.1):
perspective-correct ray-splat homography intersection, tile binning with a
global (depth | tile) sort, front-to-back alpha compositing of
color / expected & median depth / view-space normal / depth-distortion /
noise channels, and a hand-written backward.

TPU-first structure (no CUDA translation):

  preprocess.py — per-Gaussian projective setup in pure jnp (autodiff'd).
  binning.py    — capacity-padded tile binning: depth argsort + stable
                  tile-key sort (jax.lax.sort), searchsorted tile ranges.
  oracle.py     — slow pure-jnp per-pixel reference (test oracle, jax.grad).
  kernel_fwd/bwd.py — Pallas tile kernels: alpha compositing expressed as
                  chunked closed-form prefix/suffix scans via triangular
                  matmuls (MXU), fully vectorized over a 8×128 pixel tile —
                  no atomics (per-entry gradient slots are disjoint; the
                  scatter back to Gaussians is the VJP of the jnp gather).
  api.py        — custom_vjp wiring + the public ``rasterize`` entry point.
"""

from .api import RasterizeConfig, rasterize  # noqa: F401
