"""Per-Gaussian projective setup (pure jnp, differentiable).

Replaces the reference CUDA preprocess kernel (SURVEY.md §2.1 step 1) with a
batched jnp computation XLA can fuse: build the splat→pixel homography
``Tm``, its pixel-linear intersection coefficients, the dual-conic
screen-space bounding ellipse, the view-space normal, and SH→RGB.

The homography convention matches the reference bridge's python-side path
(/root/reference/gaussian_renderer/__init__.py:64-75): row-vector
``Tm = splat2world[rows 0,1,3] @ (full_proj @ ndc2pix)[cols 0,1,3]`` so that
``[u, v, 1] @ Tm = [x̃, ỹ, w̃]`` with pixel = (x̃/w̃, ỹ/w̃) and w̃ = camera z.

For a pixel (x, y), the ray-splat intersection point in homogeneous splat
coordinates is ``p = (c0 − x·c2) × (c1 − y·c2)`` (cross product of the two
pixel-line preimages, with ci the columns of Tm), which expands to the
pixel-LINEAR form ``p(x,y) = A + x·B + y·C`` with A = c0×c1, B = c1×c2,
C = c2×c0. The kernels consume (A, B, C, c2) directly — 2 FMAs per
component instead of cross products per pixel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..quat import normalize_quat, quat_to_rotmat
from ..sh import eval_sh, eval_sh_kn
from ..transforms import ndc_to_pix_matrix
from .common import (ALPHA_CUTOFF, CULL_MARGIN, FILTER_INV_SQUARE, NEAR_N,
                     SIGMA_CUTOFF)


class PreprocessOut(NamedTuple):
    # differentiable per-Gaussian fields
    A: jnp.ndarray        # (N,3)
    B: jnp.ndarray        # (N,3)
    C: jnp.ndarray        # (N,3)
    c2: jnp.ndarray       # (N,3) third homography column (depth coefficients)
    center2d: jnp.ndarray  # (N,2) projected ellipse center (px)
    opacity: jnp.ndarray  # (N,)
    rgb: jnp.ndarray      # (N,3)
    normal: jnp.ndarray   # (N,3) view-space, camera-facing
    noise: jnp.ndarray    # (N,3) fork's per-Gaussian noise channel
    # non-differentiable aux (consumed by binning; stop_gradient applied)
    depth: jnp.ndarray    # (N,) camera-space z of the center
    extent: jnp.ndarray   # (N,2) binning half extents in px (see below)
    radii: jnp.ndarray    # (N,) int32 bounding radius in px (0 = culled)
    visible: jnp.ndarray  # (N,) bool
    # exact-culling aux (stop_gradient): margin-inflated 2*ln(255*alpha);
    # binning's per-pair tile test evaluates Q(x,y) = P0^2 + P1^2
    # - rho2max*P2^2 (P_k = A_k + x*B_k + y*C_k) whose <=0 region is
    # EXACTLY the pixel set passing the kernel's alpha cutoff.
    rho2max: jnp.ndarray  # (N,)


def _cross(a, b):
    return jnp.cross(a, b)


def preprocess(
    means3d: jnp.ndarray,        # (N,3)
    scales: jnp.ndarray,         # (N,2) activated (positive) surfel scales
    quats: jnp.ndarray,          # (N,4) wxyz (normalized internally)
    opacities: jnp.ndarray,      # (N,) activated in [0,1]
    world_view: jnp.ndarray,     # (4,4) row-vector
    full_proj: jnp.ndarray,      # (4,4) row-vector
    campos: jnp.ndarray,         # (3,)
    width: int,
    height: int,
    sh_degree: int = 0,
    shs: Optional[jnp.ndarray] = None,        # (N, (deg+1)^2, 3) or None
    shs_kn: Optional[jnp.ndarray] = None,     # ((deg+1)^2*3, N) lane-major
    colors: Optional[jnp.ndarray] = None,     # (N,3) precomputed, or None
    normals_flip: bool = True,
    scale_modifier: float = 1.0,
    screen_offsets: Optional[jnp.ndarray] = None,  # (N,2) zeros; see below
    noise: Optional[jnp.ndarray] = None,           # (N,3) IG2G noise colors
) -> PreprocessOut:
    N = means3d.shape[0]
    R = quat_to_rotmat(normalize_quat(quats))           # (N,3,3)
    t_u = R[..., :, 0]
    t_v = R[..., :, 1]
    t_w = R[..., :, 2]
    su = scales[..., 0:1] * scale_modifier
    sv = scales[..., 1:2] * scale_modifier

    ndc2pix = jnp.asarray(ndc_to_pix_matrix(width, height), means3d.dtype)
    # The 4x4 constant product stays a true matmul (tiny, one-off);
    # everything batched over N is expanded to explicit FMAs below.
    hi = jax.lax.Precision.HIGHEST
    world2pix = jnp.matmul(full_proj, ndc2pix, precision=hi)  # row-vector
    w2p = world2pix[:, jnp.array([0, 1, 3])]             # (4,3): x̃, ỹ, w̃

    # Batched tiny matmuls ((N,3,4)@(4,3), (N,3)@(3,3)) are poison on TPU:
    # XLA maps them to the MXU where each 3x4 operand pads to a 128x128
    # tile (~0.1% utilization), and f32 needs the multi-pass HIGHEST
    # decomposition on top. With static inner dims the contraction is
    # just 4 broadcast FMAs on the VPU — fully fusable AND exact f32
    # (better than MXU HIGHEST, which still rounds through bf16 passes).
    def _rows_w2p(r3, affine_w=None):
        """[r3 | w] @ w2p for row-vector r3 (N,3); w in {0, 1}."""
        out = []
        for j in range(3):
            acc = r3[..., 0] * w2p[0, j] + r3[..., 1] * w2p[1, j] \
                + r3[..., 2] * w2p[2, j]
            if affine_w is not None:
                acc = acc + affine_w * w2p[3, j]
            out.append(acc)
        return out  # 3 arrays (N,)

    one_w = jnp.ones((), means3d.dtype)
    Tr0 = _rows_w2p(su * t_u)                            # row0: [su·t_u | 0]
    Tr1 = _rows_w2p(sv * t_v)                            # row1: [sv·t_v | 0]
    Tr2 = _rows_w2p(means3d, affine_w=one_w)             # row2: [mean | 1]
    # columns of Tm as (N,3) vectors: c_j = (Tr0[j], Tr1[j], Tr2[j])
    c0 = jnp.stack([Tr0[0], Tr1[0], Tr2[0]], axis=-1)
    c1 = jnp.stack([Tr0[1], Tr1[1], Tr2[1]], axis=-1)
    c2 = jnp.stack([Tr0[2], Tr1[2], Tr2[2]], axis=-1)
    A = _cross(c0, c1)
    B = _cross(c1, c2)
    C = _cross(c2, c0)

    # Screen-space gradient side channel: a rigid screen translation by
    # (dx, dy) maps c0 → c0 + dx·c2, c1 → c1 + dy·c2, which leaves B, C,
    # c2 unchanged and maps A → A − dx·B − dy·C. Injecting an all-zeros
    # offset parameter here makes jax.grad w.r.t. it return exactly the
    # per-Gaussian screen-position gradient — the functional counterpart
    # of the reference's retain_grad() dummy means2D tensor
    # (/root/reference/gaussian_renderer/__init__.py:26-31, consumed for
    # densification at scene/gaussian_model.py:405-407).
    if screen_offsets is not None:
        A = (A - screen_offsets[..., 0:1] * B - screen_offsets[..., 1:2] * C)

    # Dual-conic AABBs of the homography image of a splat-frame disc of
    # radius r (the reference CUDA instead scales the unit-disc box by 3
    # — an approximation that overshoots at low opacity and can
    # undershoot under strong foreshortening). The disc u²+v² ≤ r² has
    # PRIMAL conic diag(1,1,-r²) but the box formula consumes the DUAL
    # (its adjugate), diag(1,1,-1/r²) up to scale — the two coincide
    # only at r = 1. Using the primal here shrank every rect by ~r²
    # (verified against brute-force boundary sampling: the dual form is
    # exact to float precision, the primal form was 10-100x too small).
    def _dual_aabb(r2):
        sgn_r = jnp.stack([jnp.ones_like(r2), jnp.ones_like(r2),
                           -1.0 / r2], -1)
        dd = jnp.sum(c2 * c2 * sgn_r, axis=-1)           # (N,)
        dd_ok = jnp.abs(dd) > 1e-12
        ff = sgn_r / jnp.where(dd_ok, dd, 1.0)[..., None]
        cxr = jnp.sum(ff * c0 * c2, axis=-1)
        cyr = jnp.sum(ff * c1 * c2, axis=-1)
        txr = jnp.sum(ff * c0 * c0, axis=-1)
        tyr = jnp.sum(ff * c1 * c1, axis=-1)
        h2 = jnp.stack([cxr * cxr - txr, cyr * cyr - tyr], axis=-1)
        return cxr, cyr, h2, dd_ok

    ones_n = jnp.ones_like(opacities.reshape(N))
    cx, cy, half2, d_ok = _dual_aabb(ones_n)
    center2d = jnp.stack([cx, cy], axis=-1)
    # legacy 3-sigma extent — kept ONLY for the radii stats channel so
    # densification heuristics match the reference's screen-radius notion
    extent3 = SIGMA_CUTOFF * jnp.sqrt(jnp.maximum(half2, 1e-4))

    # Contribution cutoff: alpha = opacity*exp(-rho/2) >= ALPHA_CUTOFF
    # iff rho <= rho2max := 2*ln(opacity/ALPHA_CUTOFF). Margin absorbs the
    # coefficient-form vs 2-FMA-form f32 rounding difference in the
    # kernels so the binning cull never drops a pixel the kernel would
    # composite.
    op_n = opacities.reshape(N)
    rho2max = 2.0 * jnp.log(jnp.maximum(op_n, 1e-12) / ALPHA_CUTOFF) \
        + CULL_MARGIN
    rho2m_pos = jnp.maximum(rho2max, 1e-6)
    cxr, cyr, half2r, dr_ok = _dual_aabb(rho2m_pos)
    good_r = dr_ok & (half2r[..., 0] > 0) & (half2r[..., 1] > 0)
    good_r &= jnp.all(jnp.isfinite(half2r), axis=-1)
    ext_r = jnp.sqrt(jnp.maximum(half2r, 0.0))
    # Conic box re-centered (symmetrized) around center2d so binning keeps
    # its (center, extent) rect contract; fall back to the legacy 3-sigma
    # box when the level conic degenerates (hyperbola/near-parallel).
    hx = jnp.maximum(jnp.abs(cxr + ext_r[..., 0] - cx),
                     jnp.abs(cx - (cxr - ext_r[..., 0])))
    hy = jnp.maximum(jnp.abs(cyr + ext_r[..., 1] - cy),
                     jnp.abs(cy - (cyr - ext_r[..., 1])))
    conic_half = jnp.stack([hx, hy], axis=-1)
    conic_half = jnp.where(good_r[..., None], conic_half, extent3)
    # Union with the low-pass filter disc: rho2d = FILTER_INV_SQUARE*d^2
    # <= rho2max reaches d = sqrt(rho2max/FILTER_INV_SQUARE) around
    # center2d — a floor the 3-sigma box lacks for sub-pixel splats.
    fr = jnp.sqrt(jnp.maximum(rho2max, 0.0) / FILTER_INV_SQUARE)
    extent = jnp.maximum(conic_half, fr[..., None])

    # camera-space depth of the center (row-vector view transform);
    # elementwise FMAs for the same MXU-padding reason as above
    def _mat3_rows(r3, M, shift=None):
        cols = []
        for j in range(3):
            acc = r3[..., 0] * M[0, j] + r3[..., 1] * M[1, j] \
                + r3[..., 2] * M[2, j]
            if shift is not None:
                acc = acc + shift[j]
            cols.append(acc)
        return jnp.stack(cols, axis=-1)

    p_view = _mat3_rows(means3d, world_view[:3, :3], world_view[3, :3])
    depth = p_view[..., 2]

    visible = (depth > NEAR_N) & d_ok & (rho2max > 0.0)
    visible &= jnp.all(jnp.isfinite(extent), axis=-1)
    # rect-vs-image overlap cull
    visible &= (center2d[..., 0] + extent[..., 0] >= 0.0)
    visible &= (center2d[..., 0] - extent[..., 0] <= width - 1.0)
    visible &= (center2d[..., 1] + extent[..., 1] >= 0.0)
    visible &= (center2d[..., 1] - extent[..., 1] <= height - 1.0)

    radii = jnp.where(
        visible,
        jnp.ceil(jnp.max(extent3, axis=-1)).astype(jnp.int32),
        0,
    )

    # view-space normal, flipped toward the camera (preprocess spec §2.1)
    n_view = _mat3_rows(t_w, world_view[:3, :3])
    if normals_flip:
        flip = jnp.where(jnp.sum(p_view * n_view, axis=-1) < 0.0, 1.0, -1.0)
        n_view = n_view * flip[..., None]

    if colors is not None:
        rgb = colors
    elif shs is not None or shs_kn is not None:
        dirs = means3d - campos
        dirs = dirs * jax.lax.rsqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-16)
        if shs_kn is not None:
            # lane-major (K*3, N) table — the TPU-shaped path (see
            # ops/sh.py eval_sh_kn on why the (N, K, 3) form is 43x slower)
            rgb = jnp.maximum(eval_sh_kn(sh_degree, shs_kn, dirs) + 0.5,
                              0.0)
        else:
            # shs: (N, K, 3) coefficient-major → channel-major for eval_sh
            sh_cm = jnp.swapaxes(shs, -1, -2)            # (N, 3, K)
            rgb = jnp.maximum(eval_sh(sh_degree, sh_cm, dirs) + 0.5, 0.0)
    else:
        rgb = jnp.ones((N, 3), means3d.dtype)

    if noise is None:
        noise = jnp.zeros((N, 3), means3d.dtype)

    stop = jax.lax.stop_gradient
    return PreprocessOut(
        A=A, B=B, C=C, c2=c2, center2d=center2d,
        opacity=opacities.reshape(N), rgb=rgb, normal=n_view, noise=noise,
        depth=stop(depth), extent=stop(extent), radii=stop(radii),
        visible=stop(visible),
        rho2max=stop(rho2max),
    )
