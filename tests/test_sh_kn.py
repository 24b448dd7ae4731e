"""Round-5 lane-major hot-path regressions: eval_sh_kn must match the
reference-layout evaluator exactly, and the depth-order segment sum must
match the original-order form bit-for-bit (api.py promises identical
arithmetic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs2d_tpu.ops.sh import eval_sh, eval_sh_kn, num_sh_coeffs
from gs2d_tpu.ops.rasterize.api import (_segment_sum_rows,
                                        _segment_sum_rows_depth)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_kn_matches_eval_sh(deg):
    rng = np.random.default_rng(deg)
    K = num_sh_coeffs(deg)
    n = 257
    sh = rng.normal(size=(n, K, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = eval_sh(deg, jnp.swapaxes(jnp.asarray(sh), -1, -2),
                  jnp.asarray(dirs))
    got = eval_sh_kn(deg, jnp.asarray(sh.reshape(n, K * 3).T),
                     jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sh_table_kn_layout():
    """sh_table_kn row k*3+c equals the (N, K, 3) row-major flatten."""
    from gs2d_tpu.models.gaussians import GaussianParams, sh_table_kn
    rng = np.random.default_rng(0)
    cap, K = 64, 16
    p = GaussianParams(
        xyz=jnp.zeros((cap, 3)),
        features_dc=jnp.asarray(rng.normal(size=(cap, 1, 3))
                                .astype(np.float32)),
        features_rest=jnp.asarray(rng.normal(size=(cap, K - 1, 3))
                                  .astype(np.float32)),
        scaling=jnp.zeros((cap, 2)), rotation=jnp.zeros((cap, 4)),
        opacity=jnp.zeros((cap, 1)))
    tbl = np.asarray(sh_table_kn(p))                       # (K*3, cap)
    full = np.concatenate([np.asarray(p.features_dc),
                           np.asarray(p.features_rest)], axis=1)
    np.testing.assert_array_equal(tbl, full.reshape(cap, K * 3).T)


def test_segment_sum_depth_matches_original():
    """Depth-order endpoint form == original-order form, bitwise, for
    random segment structures including empty segments and a clamped
    tail."""
    rng = np.random.default_rng(3)
    n_gauss, C, P = 97, 5, 4096
    # random per-gaussian counts (many zeros), laid out contiguously in a
    # random depth order
    counts = rng.integers(0, 9, n_gauss)
    counts[rng.random(n_gauss) < 0.3] = 0
    order = rng.permutation(n_gauss).astype(np.int32)     # depth → original
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(n_gauss, dtype=np.int32)
    counts_d = counts[order]
    ends_d = np.cumsum(counts_d).astype(np.int32)
    starts_d = ends_d - counts_d
    assert ends_d[-1] <= P
    seg_start = np.zeros(n_gauss, np.int32)
    seg_end = np.zeros(n_gauss, np.int32)
    seg_start[order] = starts_d
    seg_end[order] = ends_d
    d_pairs = rng.normal(size=(P, C)).astype(np.float32)

    ref = np.asarray(_segment_sum_rows(
        jnp.asarray(d_pairs), jnp.asarray(seg_start), jnp.asarray(seg_end)))
    got = np.asarray(_segment_sum_rows_depth(
        jnp.asarray(d_pairs), jnp.asarray(ends_d), jnp.asarray(inv_order)))
    np.testing.assert_array_equal(got, ref)

    # sanity vs a plain numpy segment sum
    exact = np.zeros((n_gauss, C), np.float64)
    for g in range(n_gauss):
        exact[g] = d_pairs[seg_start[g]:seg_end[g]].sum(0)
    np.testing.assert_allclose(ref, exact, rtol=1e-4, atol=1e-4)
