"""Microbench: ways to materialize the pair-expanded entry table.

We need out[slot] = table[gid[slot]] for ~780k slots from a ~100k-row
table of 24 f32 columns. Candidates:
  A. random row gather table[gid]              (current, ~25ms)
  B. monotonic row gather (sorted gid)         (locality probe)
  C. variadic sort: key=inv, payload=(P,24)    (permutation via sort)
  D. gather width scaling: 8 vs 24 vs 64 cols
  E. two-step: monotonic expand then sort-permute
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.utils.timing import timed_loop

N = 100_000
P = 780_000


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((N, 24)).astype(np.float32))
    gid_r = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
    gid_m = jnp.sort(gid_r)
    inv = jnp.asarray(rng.permutation(P).astype(np.int32))
    pairs = jnp.asarray(rng.random((P, 24)).astype(np.float32))

    def chain(val, args):
        return tuple(a + 1e-30 * val.astype(a.dtype) if a.dtype.kind == "f"
                     else a for a in args)

    def t_gather_r(args):
        tab, gid = args[0], args[1]
        out = tab[gid]
        return chain(jnp.sum(out[:8]), args)

    def t_gather_m(args):
        tab, gid = args[0], args[2]
        out = tab[gid]
        return chain(jnp.sum(out[:8]), args)

    def t_sortperm(args):
        pr, key = args[3], args[4]
        key2 = jnp.broadcast_to(key[:, None], pr.shape)
        _, out = jax.lax.sort((key2, pr), dimension=0, num_keys=1)
        return chain(jnp.sum(out[:8]), args)

    def t_sortperm_1key(args):
        pr, key = args[3], args[4]
        ops = (key,) + tuple(pr[:, i] for i in range(24))
        res = jax.lax.sort(ops, dimension=0, num_keys=1)
        return chain(jnp.sum(res[1][:8]), args)

    def t_gather_w8(args):
        tab, gid = args[0], args[1]
        out = tab[:, :8][gid]
        return chain(jnp.sum(out[:8]), args)

    def t_gather_w64(args):
        tab, gid = args[0], args[1]
        wide = jnp.concatenate([tab, tab, tab[:, :16]], 1)
        wide = jax.lax.optimization_barrier(wide)
        out = wide[gid]
        return chain(jnp.sum(out[:8]), args)

    def t_argsort_gather(args):
        # sort (key, iota) then row-gather with the resulting permutation
        pr, key = args[3], args[4]
        _, perm = jax.lax.sort((key, jnp.arange(P, dtype=jnp.int32)),
                               dimension=0, num_keys=1)
        out = pr[perm]
        return chain(jnp.sum(out[:8]), args)

    args0 = (table, gid_r, gid_m, pairs, inv)
    for name, fn in [("A random row gather", t_gather_r),
                     ("B monotonic row gather", t_gather_m),
                     ("C sort-permute 2d-payload", t_sortperm),
                     ("C2 sort-permute 24x1d", t_sortperm_1key),
                     ("D width-8 gather", t_gather_w8),
                     ("D width-64 gather", t_gather_w64),
                     ("E argsort+row gather", t_argsort_gather)]:
        jfn = jax.jit(fn)
        t, _ = timed_loop(jfn, args0, n=10)
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.devices())
    main()
