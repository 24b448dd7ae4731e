"""Shared constants and layouts for the surfel rasterizer.

Numeric contract constants follow the reference CUDA rasterizer's
(SURVEY.md §2.1, reconstructed spec): 0.99 alpha clamp, 1/255 alpha cutoff,
1e-4 transmittance early-out, 0.2/100.0 near/far for the distortion depth
remap, 3-sigma screen-space extent, inverse-square low-pass filter 2.0.
"""

from __future__ import annotations

# Compositing guards
ALPHA_CLAMP = 0.99          # max per-splat alpha
ALPHA_CUTOFF = 1.0 / 255.0  # min alpha to composite
T_EPS = 1e-4                # stop when transmittance would fall below this
NEAR_N = 0.2                # near plane for per-pixel depth validity & m-map
FAR_N = 100.0               # far plane for the distortion depth remap
FILTER_INV_SQUARE = 2.0     # screen-space low-pass: rho2d = 2*d^2 (sigma=1/sqrt(2) px)
SIGMA_CUTOFF = 3.0          # 3-sigma bounding extent
CULL_MARGIN = 0.05          # rho^2 safety band for the exact binning cull:
                            # pairs within the band are kept even though the
                            # coefficient-form Q and the kernels' 2-FMA form
                            # round differently (band ≈ 1e-7 relative at the
                            # cutoff — far beyond f32 noise)

# TPU tile shape: one Pallas program composites a (16, 32) pixel tile,
# flattened to (1, 512) lanes in tile-major image layout. Near-square
# tiles minimize per-splat pixel work (a radius-r splat touches
# (2r/TW+1)(2r/TH+1)·TW·TH pixels — (8,128) vreg-shaped tiles cost ~2.3x
# more at typical r≈10px) while 512 lanes keep every VPU op full-width.
TILE_H = 16
TILE_W = 32
TILE_PX = TILE_H * TILE_W

# Entry record layout: one row of the binned, depth-sorted, per-tile
# duplicated entry array. p(x, y) = A + x*B + y*C is the homogeneous
# uv-plane intersection point of the pixel ray with the splat plane
# ((u, v) = (p0/p2, p1/p2)); c2 is the third homography column, giving the
# camera-space depth of the intersection as u*c2[0] + v*c2[1] + c2[2].
FLD_A = slice(0, 3)
FLD_B = slice(3, 6)
FLD_C = slice(6, 9)
FLD_C2 = slice(9, 12)
FLD_CENTER = slice(12, 14)   # screen-space center of the projected ellipse
FLD_OPACITY = 14
FLD_RGB = slice(15, 18)
FLD_NORMAL = slice(18, 21)
FLD_NOISE = slice(21, 24)
ENTRY_F = 24

# Backward gradient-row layout (d_entries). Same field order as the entry
# record MINUS the two center columns: the center field feeds only the
# low-pass filter branch, whose gradient the reference removed
# (README.md:114), so its wire gradient is identically zero — carrying it
# would add 8% to the backward's DMA-out, the slot→expansion gather, and
# the segment sum. The screen-space densification gradient flows through
# A instead (preprocess.py screen_offsets: A → A − dx·B − dy·C).
DFLD_A = slice(0, 3)
DFLD_B = slice(3, 6)
DFLD_C = slice(6, 9)
DFLD_C2 = slice(9, 12)
DFLD_OPACITY = 12
DFLD_RGB = slice(13, 16)
DFLD_NORMAL = slice(16, 19)
DFLD_NOISE = slice(19, 22)
DENTRY_F = 22

# Output channel layout of the tile kernel (15 channels; the bridge exposes
# the first 13, channels 13-14 are totals needed by the backward pass).
OUT_RGB = slice(0, 3)
OUT_DEPTH = 3        # alpha-weighted expected depth (sum w*z)
OUT_ALPHA = 4        # 1 - final transmittance
OUT_NORMAL = slice(5, 8)
OUT_MEDIAN = 8       # depth where transmittance crosses 0.5
OUT_DIST = 9         # depth-distortion accumulator
OUT_NOISE = slice(10, 13)
OUT_M1 = 13          # sum of w*m   (aux, backward only)
OUT_M2 = 14          # sum of w*m^2 (aux, backward only)
NUM_OUT = 15
NUM_PUBLIC_OUT = 13


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_to(x: int, m: int) -> int:
    return cdiv(x, m) * m
