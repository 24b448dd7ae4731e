"""Opacity-adaptive extent correctness vs brute-force boundary sampling.

The binning rect (preprocess `extent` around `center2d`) must COVER the
level set rho3d <= rho2max — every pixel where the kernel's alpha test
can pass. Round 2 shipped a dual-conic sign bug (primal diag(1,1,-r²)
where the box formula needs the dual diag(1,1,-1/r²)) that shrank every
rect by ~r²; kernel and oracle share the rect, so only an independent
check like this one can catch it. The brute-force truth samples the
boundary u² + v² = rho2max through the same homography the kernels use.
"""

import numpy as np

from gs2d_tpu.ops.rasterize.preprocess import preprocess

from .utils import lookat_camera, random_cloud


def test_extent_covers_alpha_support():
    cam = lookat_camera(width=512, height=256)
    n = 300
    means, scales, quats, opac, rgb, _ = random_cloud(
        n, 3, spread=1.2, scale_lo=0.03, scale_hi=0.4)
    pre = preprocess(*(np.asarray(x) for x in (means, scales, quats, opac)),
                     cam.world_view, cam.full_proj, cam.campos,
                     cam.width, cam.height, colors=np.asarray(rgb))

    A = np.asarray(pre.A)
    B = np.asarray(pre.B)
    C = np.asarray(pre.C)
    center = np.asarray(pre.center2d)
    extent = np.asarray(pre.extent)
    r2m = np.asarray(pre.rho2max)
    visible = np.asarray(pre.visible)

    # p(x, y) = A + x·B + y·C is the homogeneous splat-frame intersection;
    # invert: the boundary point (u, v) with u²+v² = r² maps to the pixel
    # where p ∝ (u, v, 1). From binning's Q-form: pixels with
    # P0² + P1² − r²·P2² = 0 are the boundary. Sample it directly by
    # solving for each boundary direction via the forward map instead:
    # pixel x = (c0·m)/(c2·m) with m = (u, v, 1) and [c0;c1;c2] the
    # homography columns — recover them from A, B, C (A = c0×c1,
    # B = c1×c2, C = c2×c0, and c2 is carried explicitly).
    c2 = np.asarray(pre.c2)
    th = np.linspace(0, 2 * np.pi, 256)

    checked = 0
    for i in range(n):
        if not visible[i] or not np.isfinite(r2m[i]) or r2m[i] <= 0:
            continue
        # rebuild c0, c1 from the cross-product identities:
        # B = c1×c2 ⇒ c0 = B×c2 / |c2|² + (c0·c2)/|c2|²·c2 — avoid the
        # reconstruction entirely by using the IMPLICIT boundary:
        # pixels p where Q(p) = P0² + P1² − r²P2² = 0. March rays from
        # the center outward and find the farthest zero of Q per angle.
        r = np.sqrt(r2m[i])
        # distances to probe along each direction (up to the image diag)
        tmax = float(np.hypot(cam.width, cam.height))
        ts = np.linspace(0, tmax, 4096)
        dx = np.cos(th)[:, None] * ts[None, :]
        dy = np.sin(th)[:, None] * ts[None, :]
        X = center[i, 0] + dx
        Y = center[i, 1] + dy
        P0 = A[i, 0] + X * B[i, 0] + Y * C[i, 0]
        P1 = A[i, 1] + X * B[i, 1] + Y * C[i, 1]
        P2 = A[i, 2] + X * B[i, 2] + Y * C[i, 2]
        inside = (P0 * P0 + P1 * P1) <= r2m[i] * (P2 * P2)
        if not inside.any():
            continue
        checked += 1
        # support points inside the level set (bounded probe range)
        sx = X[inside]
        sy = Y[inside]
        # every in-image support pixel must lie within the binning rect
        # (clip to the image: out-of-image support never rasterizes)
        in_img = (sx >= 0) & (sx <= cam.width - 1) & \
                 (sy >= 0) & (sy <= cam.height - 1)
        if not in_img.any():
            continue
        sx, sy = sx[in_img], sy[in_img]
        margin = 1.0  # the rect is in pixels; allow one pixel of slack
        assert (np.abs(sx - center[i, 0]) <= extent[i, 0] + margin).all() \
            and (np.abs(sy - center[i, 1]) <= extent[i, 1] + margin).all(), (
            f"splat {i}: alpha support escapes the binning rect — "
            f"extent {extent[i]}, worst dx "
            f"{np.abs(sx - center[i, 0]).max():.1f}, dy "
            f"{np.abs(sy - center[i, 1]).max():.1f}")
    assert checked > 50, f"too few splats exercised ({checked})"
