"""gs2d_tpu — TPU-native 2D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kumass2020/2d-gaussian-splatting (itself the official impl of
"2D Gaussian Splatting for Geometrically Accurate Radiance Fields",
SIGGRAPH 2024, plus an InstructGS2GS research fork layer).

Layer map (TPU-native counterparts of the reference layers, see SURVEY.md):

  ops/rasterize   — the differentiable surfel rasterizer: pure-jnp oracle +
                    Pallas TPU forward/backward kernels with a custom VJP
                    (replaces the CUDA submodule diff-surfel-rasterization).
  ops/            — SH evaluation, quaternions, camera math, KNN, SSIM,
                    TSDF fusion, marching cubes, depth→normal.
  models/         — capacity-padded Gaussian parameter pytree + masked
                    densification (replaces scene/gaussian_model.py's
                    torch optimizer surgery with functional masked updates).
  scene/          — COLMAP/Blender dataset readers, cameras, PLY IO.
  train/          — jitted train step, masked Adam, losses, checkpoints.
  parallel/       — jax.sharding Mesh scale-out: pixel/tile sharding +
                    gradient psum over ICI (new design; the reference is
                    single-GPU).
  render/         — renderer bridge (same output dict contract as
                    gaussian_renderer/__init__.py) + SIBR viewer protocol.
  eval/           — PSNR/SSIM/LPIPS, DTU chamfer, TnT F1 harnesses.
"""

import jax as _jax

# TPU matmuls/convs default to single-pass bf16 rounding, which is NOT
# acceptable for this framework's numerics: it visibly shifts rasterized
# images (~4e-3/pixel), corrupts SSIM (near-zero variances go negative,
# exploding the ratio — observed SSIM "4.06" on device) and degrades loss
# gradients. Force full-f32 precision everywhere; the hot Pallas kernels
# choose their own precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: every CLI (train/render/metrics/view)
# is its own process, and on remote-compile backends a cold 1080p step
# compile runs 30 s-8 min — cache hits cut that to ~1 s. Opt out with
# GS2D_NO_COMPILE_CACHE=1 or point GS2D_COMPILE_CACHE elsewhere.
import os as _os

if not _os.environ.get("GS2D_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "GS2D_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gs2d_tpu",
                      "xla_cache"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except OSError:
        pass  # read-only home: run without the cache


__version__ = "0.1.0"
