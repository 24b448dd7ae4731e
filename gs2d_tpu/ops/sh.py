"""Real spherical-harmonics evaluation, degrees 0..4.

Capability parity with the reference's hardcoded SH evaluator
(/root/reference/utils/sh_utils.py:57-117): same real-SH basis constants,
same ``0.5 + SH`` color convention handled by callers.

TPU notes: fully vectorized over the leading batch axes; the per-degree
polynomial evaluation is a handful of fused VPU elementwise ops. Degree is
a static Python int so each active degree jit-specializes to a fixed
expression (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2

def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate real SH of ``degree`` in directions ``dirs``.

    Args:
      degree: static int in [0, 4].
      sh: [..., C, (degree+1)^2] coefficients (channel-major like the
          reference's ``shs_view``).
      dirs: [..., 3] unit directions (broadcast against sh's batch dims).

    Returns:
      [..., C] evaluated values (no +0.5 offset; callers add it).
    """
    assert 0 <= degree <= 4
    result = C0 * sh[..., 0]
    if degree < 1:
        return result

    x = dirs[..., 0:1]
    y = dirs[..., 1:2]
    z = dirs[..., 2:3]
    result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
    if degree < 2:
        return result

    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    result = (
        result
        + C2[0] * xy * sh[..., 4]
        + C2[1] * yz * sh[..., 5]
        + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
        + C2[3] * xz * sh[..., 7]
        + C2[4] * (xx - yy) * sh[..., 8]
    )
    if degree < 3:
        return result

    result = (
        result
        + C3[0] * y * (3 * xx - yy) * sh[..., 9]
        + C3[1] * xy * z * sh[..., 10]
        + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
        + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
        + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
        + C3[5] * z * (xx - yy) * sh[..., 14]
        + C3[6] * x * (xx - 3 * yy) * sh[..., 15]
    )
    if degree < 4:
        return result

    result = (
        result
        + C4[0] * xy * (xx - yy) * sh[..., 16]
        + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
        + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
        + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
        + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
        + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
        + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
        + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
        + C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24]
    )
    return result


def sh_basis(degree: int, dirs: jnp.ndarray) -> list:
    """Real-SH basis values b_k(dirs), k = 0..(degree+1)^2-1, as a list of
    arrays shaped like ``dirs[..., 0]``. Same constants/ordering as
    ``eval_sh`` (reference utils/sh_utils.py:57-112)."""
    assert 0 <= degree <= 4
    ones = jnp.ones_like(dirs[..., 0])
    basis = [C0 * ones]
    if degree < 1:
        return basis
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    basis += [-C1 * y, C1 * z, -C1 * x]
    if degree < 2:
        return basis
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    basis += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
              C2[3] * xz, C2[4] * (xx - yy)]
    if degree < 3:
        return basis
    basis += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
              C3[2] * y * (4 * zz - xx - yy),
              C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
              C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
              C3[6] * x * (xx - 3 * yy)]
    if degree < 4:
        return basis
    basis += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
              C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
              C4[4] * (zz * (35 * zz - 30) + 3), C4[5] * xz * (7 * zz - 3),
              C4[6] * (xx - yy) * (7 * zz - 1), C4[7] * xz * (xx - 3 * yy),
              C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return basis


def eval_sh_kn(degree: int, sh_kn: jnp.ndarray, dirs: jnp.ndarray
               ) -> jnp.ndarray:
    """SH evaluation over a LANE-MAJOR coefficient table.

    ``sh_kn`` is (K*C, N) — the row-major flatten of the reference's
    (N, K, C) coefficient layout, transposed so N rides the 128-lane axis.
    The (N, K, 3) form tile-pads its 3-wide minor dim 43x on TPU; every
    materialization (mask multiply, dc/rest concat, eval slices, and all
    their VJPs) then moves ~43x its real bytes — measured ~330 ms of the
    1M-splat/1080p train step before this orientation.

    Returns (N, C) values (no +0.5 offset; callers add it).
    """
    K = num_sh_coeffs(degree)
    C = sh_kn.shape[0] // K
    basis = sh_basis(degree, dirs)
    chans = []
    for c in range(C):
        acc = basis[0] * sh_kn[c]
        for k in range(1, K):
            acc = acc + basis[k] * sh_kn[k * C + c]
        chans.append(acc)
    return jnp.stack(chans, axis=-1)


def rgb_to_sh(rgb):
    """RGB in [0,1] → DC SH coefficient (reference utils/sh_utils.py:114)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    """DC SH coefficient → RGB (reference utils/sh_utils.py:117)."""
    return sh * C0 + 0.5
