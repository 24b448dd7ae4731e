"""Structural perf-regression gates on the lowered rasterizer graph.

The wire format is chunk-blocked (P/chunk, 24, chunk): Mosaic rejects
HBM DMA slices with a non-128 minor dim, and a flat (P, 24) HBM buffer
is physically lane-padded to (P, 128) — 5.3x footprint. The ONLY legal
P-sized relayout is therefore the *blocked* (…, chunk, 24)→(…, 24,
chunk) transpose feeding the kernels (12 KB-local, cache-friendly). A
FLAT (P, 24)↔(24, P) transpose — the round-1 design XLA could silently
reintroduce through an innocuous layout change — moves the whole padded
table twice and costs hundreds of milliseconds at 10M pairs. Lowering
is cheap (no compile, no execution), so these checks pin the graph
SHAPE itself:

  * no FLAT transpose of a P-sized (pairs, 24) table in fwd or bwd
    (the 3-D blocked transposes carry different shapes and are allowed),
  * at most two sorts in the whole fwd+bwd graph (binning's N-sized
    depth argsort + its P-sized tile-key sort) — a third one means a
    gradient path started re-sorting.
"""

import re

import jax
import jax.numpy as jnp

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.preprocess import preprocess

from .utils import lookat_camera, random_cloud

CAP = 1 << 15


def _lowered_text():
    cam = lookat_camera(width=256, height=128)
    n = 500
    means, scales, quats, opac, rgb, noise = random_cloud(n, 0)
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=CAP, chunk=16, interpret=True)
    cot = jnp.ones((15, cam.height, cam.width), jnp.float32)

    def loss(means, scales, quats, opac, rgb):
        pre = preprocess(means, scales, quats, opac, cam.world_view,
                         cam.full_proj, cam.campos, cam.width, cam.height,
                         colors=rgb)
        out, _ = rasterize(pre, cfg)
        return jnp.sum(out * cot)

    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, rgb))
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))).lower(
        *args).as_text()


def test_no_pair_table_transpose_and_single_sort():
    text = _lowered_text()

    # any transpose whose type mentions the P-sized pair table is the
    # regression this file exists to catch
    pair_tab = re.compile(
        rf"transpose[^\n]*({CAP}x24|24x{CAP})x?f32", re.IGNORECASE)
    bad = [ln for ln in text.splitlines() if pair_tab.search(ln)]
    assert not bad, (
        "P-sized pair-table transpose reappeared in the lowered graph "
        f"(PERF.md fix #1 regressed):\n" + "\n".join(bad[:5]))

    n_sorts = len(re.findall(r"\bsort\b", text))
    assert n_sorts <= 4, (
        "expected at most four sorts (N-sized depth argsort, P-sized "
        "tile-key sort, and two deliberate 2-operand permutation "
        "inversions: binning's `inv` and the N-sized `inv_order` depth-"
        "rank inverse — sorted outputs need no serial scatter-apply "
        f"pass), found {n_sorts} — a gradient path started re-sorting "
        "pair tables")
