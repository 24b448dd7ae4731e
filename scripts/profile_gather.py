"""Benchmark TPU gather formulations for the entry-expansion step.

The rasterizer needs entries = packed[gid] where packed is (N, 24) f32 and
gid is (P,) int32 with P ~ 3M. Chained data-dependent timing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.utils.timing import timed_loop


def bench(name, fn, state, n=10):
    t, _ = timed_loop(jax.jit(fn), state, n=n)
    print(f"{name}: {t*1e3:.2f} ms")
    return t


def main():
    N = 100_000
    P = (1 << 21) + 8160 * 128
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((N, 24), np.float32))
    packed_T = jnp.asarray(np.ascontiguousarray(packed.T))
    gid_np = rng.integers(0, N, P).astype(np.int32)
    gid = jnp.asarray(gid_np)
    gid_sorted = jnp.asarray(np.sort(gid_np))
    print(f"N={N} P={P} bytes={P*24*4/1e6:.0f}MB")

    def chain(out, state):
        return (state[0] + 1e-30 * jnp.sum(out[..., :8]).astype(jnp.float32),
                ) + state[1:]

    # A: row gather then transpose (current)
    bench("A row-gather (N,24)[gid].T", lambda s: chain(s[0][s[1]].T, s),
          (packed, gid))

    # B: row gather, no transpose
    bench("B row-gather (N,24)[gid]", lambda s: chain(s[0][s[1]], s),
          (packed, gid))

    # C: lane gather (24,N) take axis=1
    bench("C lane-gather (24,N)[:,gid]",
          lambda s: chain(jnp.take(s[0], s[1], axis=1), s),
          (packed_T, gid))

    # D: 24 separate 1-D gathers
    def d_fn(s):
        pt, g = s
        cols = [pt[i][g] for i in range(24)]
        return chain(jnp.stack(cols), s)
    bench("D 24x 1-D gathers", d_fn, (packed_T, gid))

    # E: row gather with sorted indices
    bench("E row-gather sorted gid", lambda s: chain(s[0][s[1]], s),
          (packed, gid_sorted))

    # F: padded to 128 lanes then row gather
    packed_pad = jnp.zeros((N, 128), jnp.float32).at[:, :24].set(packed)
    bench("F row-gather (N,128)[gid]", lambda s: chain(s[0][s[1]], s),
          (packed_pad, gid))

    # G: bf16 row gather
    bench("G row-gather bf16", lambda s: chain(s[0][s[1]], s),
          (packed.astype(jnp.bfloat16), gid))

    # H: dynamic_slice loop-free: reshape gid to (P//128,128) lane gather
    def h_fn(s):
        pt, g = s
        g2 = g.reshape(-1, 128)
        out = jax.vmap(lambda gg: jnp.take(pt, gg, axis=1),
                       in_axes=0, out_axes=0)(g2)
        return chain(out, s)
    bench("H vmapped lane gather rows of 128", h_fn, (packed_T, gid))

    # I: scatter formulation (inverse): write rows to slots
    perm = jnp.asarray(rng.permutation(P)[:N].astype(np.int32))
    def i_fn(s):
        pk, slots = s
        out = jnp.zeros((P, 24), jnp.float32).at[slots].set(pk)
        return chain(out, s)
    bench("I row-scatter N rows into P", i_fn, (packed, perm))


if __name__ == "__main__":
    main()
