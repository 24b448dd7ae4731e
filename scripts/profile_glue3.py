"""Binning/glue microbenches, part 2 (part 1 = profile_glue2.py).

Completes the stage decomposition at the 1M-splat/10.2M-pair scene and
probes the hypotheses that shape the glue attack:
  * row-gather cost vs row WIDTH (is the per-row cost tile-granularity
    bound, i.e. width-independent up to ~128 lanes?),
  * row SCATTER vs row gather for the backward slot->pair reorder,
  * the actual binning patterns: seg scatter-max + cummax, the (N,k)
    grec gather by monotone gidx, the (T,3) small-table gather, the
    P-sized slot scatters.

Every probe chains a f32 token through an INPUT of the computation so
iterations are data-dependent (DCE/overlap-proof) without perturbing
the dtype of the indexed arrays.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import pack_entries, suggest_pairs_capacity
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
N = 1_000_000


def probe(name, fn, n=8):
    """fn: (token f32 scalar) -> token f32 scalar, jitted by us."""
    jfn = jax.jit(fn)
    dt, _ = timed_loop(jfn, jnp.float32(0.0), n=n)
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(N))
    pre = jax.jit(lambda m: preprocess(
        m, scales, quats, opac, cam.world_view, cam.full_proj, cam.campos,
        W, H, colors=rgb))(means)
    cap = suggest_pairs_capacity(pre, W, H)
    bins = jax.jit(lambda c2: bin_gaussians(
        c2, pre.extent, pre.depth, pre.visible, W, H, cap, 128))(pre.center2d)
    packed = jax.jit(pack_entries)(pre)                  # (N, 24)
    gid = bins.gid                                       # (P,)
    P = int(gid.shape[0])
    print(f"N={N} P_alloc={P} pairs={int(bins.num_pairs)}", flush=True)

    key0 = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key0, P)

    # --- A: row-gather width sweep (arbitrary ids, table N rows) ---------
    for C in (1, 4, 8, 14, 32, 128):
        tab = jnp.ones((N, C), jnp.float32)
        probe(f"A: gather P rows from (N,{C})",
              lambda tok, tab=tab: tok + 1e-30 * jnp.sum(
                  (tab + tok * 1e-30)[gid][::1013]))

    # --- B: scatter vs gather for the bwd reorder ------------------------
    rows24 = jnp.ones((P, 24), jnp.float32)
    probe("B: gather P rows (P,24)[perm]  (current bwd)",
          lambda tok: tok + 1e-30 * jnp.sum(
              (rows24 + tok * 1e-30)[perm][::1013]))
    probe("B: scatter P rows zeros.at[perm].set(rows)",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.zeros((P, 24), jnp.float32).at[perm].set(
                  rows24 + tok * 1e-30)[::1013]))
    rows1 = jnp.ones((P,), jnp.float32)
    probe("B: scatter P rows 1-col",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.zeros((P,), jnp.float32).at[perm].set(
                  rows1 + tok * 1e-30)[::1013]))
    rows2 = jnp.ones((P, 2), jnp.float32)
    probe("B: scatter P rows 2-col",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.zeros((P, 2), jnp.float32).at[perm].set(
                  rows2 + tok * 1e-30)[::1013]))

    # --- C: binning internals -------------------------------------------
    starts = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (N,), 0, P,
                                         dtype=jnp.int32))
    vals = jnp.arange(N, dtype=jnp.int32)
    probe("C: seg scatter-max(N into P) + cummax(P)",
          lambda tok: tok + 1e-30 * jnp.sum(jax.lax.cummax(
              jnp.zeros((P,), jnp.int32).at[starts].max(
                  vals + tok.astype(jnp.int32), mode="drop"))[::1013]
              .astype(jnp.float32)))
    gidx = jnp.sort(jax.random.randint(jax.random.PRNGKey(4), (P,), 0, N,
                                       dtype=jnp.int32))
    for C in (4, 14):
        gtab = jnp.ones((N, C), jnp.float32)
        probe(f"C: grec gather (N,{C})[monotone gidx] P rows",
              lambda tok, gtab=gtab: tok + 1e-30 * jnp.sum(
                  (gtab + tok * 1e-30)[gidx][::1013]))
    T = 4080
    keys = jnp.sort(jax.random.randint(jax.random.PRNGKey(5), (P,), 0, T,
                                       dtype=jnp.int32))
    ttab = jnp.ones((T, 3), jnp.float32)
    probe("C: trec gather (T,3)[sorted keys] P rows",
          lambda tok: tok + 1e-30 * jnp.sum(
              (ttab + tok * 1e-30)[keys][::1013]))
    probe("C: searchsorted T queries over sorted P",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.searchsorted(keys, jnp.arange(T, dtype=jnp.int32)
                               ).astype(jnp.float32))
          + 1e-30 * tok * jnp.float32(jnp.sum(keys[::2048])))
    vi = jnp.arange(P, dtype=jnp.int32)
    probe("C: slot scatter int32 at[perm].set (gid1)",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.zeros((P,), jnp.int32).at[perm].set(
                  vi + tok.astype(jnp.int32), mode="drop")[::1013]
              .astype(jnp.float32)))
    probe("C: cumsum over P int32",
          lambda tok: tok + 1e-30 * jnp.sum(
              jnp.cumsum(vi + tok.astype(jnp.int32))[::1013]
              .astype(jnp.float32)))


if __name__ == "__main__":
    main()
