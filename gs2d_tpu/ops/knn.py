"""K-nearest-neighbor init helper.

Replaces the CUDA ``simple_knn._C.distCUDA2`` (SURVEY.md §2.2): mean
squared distance to the 3 nearest neighbors, used once at model init
(/root/reference/scene/gaussian_model.py:134). Implemented as a blockwise
exact O(N²) pairwise search — N² distance tiles are MXU-shaped matmuls
(‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b), streamed in row blocks so memory stays
O(N·block). Exact, fast on TPU, and only init-path so never hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def mean_sq_dist3(points: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """points (N, 3) → (N,) mean of squared distances to the 3 NNs."""
    n = points.shape[0]
    npad = -(-n // block) * block
    pts = jnp.zeros((npad, 3), jnp.float32).at[:n].set(points)
    valid = (jnp.arange(npad) < n)
    sq = jnp.sum(pts * pts, axis=-1)

    def row_block(i):
        rows = jax.lax.dynamic_slice(pts, (i * block, 0), (block, 3))
        rsq = jax.lax.dynamic_slice(sq, (i * block,), (block,))
        d2 = (rsq[:, None] + sq[None, :]
              - 2.0 * rows @ pts.T)                      # (block, npad)
        ridx = jnp.arange(block) + i * block
        same = ridx[:, None] == jnp.arange(npad)[None, :]
        d2 = jnp.where(same | ~valid[None, :], jnp.inf, d2)
        neg_top3, _ = jax.lax.top_k(-d2, 3)
        return jnp.mean(jnp.maximum(-neg_top3, 0.0), axis=-1)

    out = jax.lax.map(row_block, jnp.arange(npad // block))
    return out.reshape(npad)[:n]
