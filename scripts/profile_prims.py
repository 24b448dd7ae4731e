"""Calibrate the TPU cost of the bookkeeping primitives binning is built
from: 1-D gather/scatter (small + capacity-sized tables), row gather/
scatter, cumsum/cummax, lax.sort at several operand counts, argsort, and
the blocked forward-fill. Binning redesign decisions (which ops to fuse,
which to eliminate) come from these numbers, not guesses.

Usage: python scripts/profile_prims.py [P] [N]
Defaults P=5_242_880 (5M pairs), N=1_048_576 (1M gaussians).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.utils.timing import timed_loop

P = int(sys.argv[1]) if len(sys.argv) > 1 else 5 * (1 << 20)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
T = 4080


_RUN_IDX = [0]


def run(name, fn, state, n=8):
    _RUN_IDX[0] += 1
    if _RUN_IDX[0] <= int(os.environ.get("PRIMS_SKIP", "0")):
        return 0.0
    f = jax.jit(fn)
    dt, _ = timed_loop(f, state, n=n)
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return dt


def chain(val, x):
    return x + (1e-30 * val).astype(x.dtype)


def main():
    skip = int(os.environ.get("PRIMS_SKIP", "0"))
    rng = np.random.default_rng(0)
    idxP_N = jnp.asarray(rng.integers(0, N, P, dtype=np.int32))   # P->N ids
    idxP_P = jnp.asarray(rng.integers(0, P, P, dtype=np.int32))   # P->P perm-ish
    idxN_P = jnp.asarray(rng.integers(0, P, N, dtype=np.int32))   # N updates into P
    idxP_T = jnp.asarray(rng.integers(0, T, P, dtype=np.int32))
    fP = jnp.asarray(rng.normal(size=P).astype(np.float32))
    fN = jnp.asarray(rng.normal(size=N).astype(np.float32))
    fT = jnp.asarray(rng.normal(size=T).astype(np.float32))
    rowsN = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    keyP = jnp.sort(idxP_T)  # nearly-sorted tile-like keys
    i32P = idxP_T

    # --- 1-D gathers ---------------------------------------------------
    run("gather1d_P_from_N", lambda x: chain(jnp.sum(fN[idxP_N][::997]), x), fP)
    run("gather1d_P_from_P", lambda x: chain(jnp.sum(fP[idxP_P][::997]), x), fP)
    run("gather1d_P_from_T(small)", lambda x: chain(jnp.sum(fT[idxP_T][::997]), x), fP)
    run("take_P_from_T(small)", lambda x: chain(
        jnp.sum(jnp.take(fT, idxP_T)[::997]), x), fP)
    # one-hot matmul alternative for small-table gather
    run("onehotmm_P_from_T68", lambda x: chain(
        jnp.sum((jax.nn.one_hot(idxP_T % 68, 68, dtype=jnp.float32)
                 @ fT[:68])[::997]), x), fP)

    # --- row gathers / scatters -----------------------------------------
    run("rowgather_P_from_(N,16)", lambda x: chain(
        jnp.sum(rowsN[idxP_N][::997, ::3]), x), fP)
    run("rowscatter_N_into_(P,16)", lambda x: chain(
        jnp.sum(jnp.zeros((P, 16), jnp.float32).at[idxN_P].set(rowsN)[::2011, ::5]), x), fP)

    # --- 1-D scatters ----------------------------------------------------
    run("scatter1d_N_into_P", lambda x: chain(
        jnp.sum(jnp.zeros((P,), jnp.float32).at[idxN_P].set(fN)[::997]), x), fP)
    run("scatter1d_P_into_P", lambda x: chain(
        jnp.sum(jnp.zeros((P,), jnp.float32).at[idxP_P].set(fP)[::997]), x), fP)
    run("scatteradd_P_into_T", lambda x: chain(
        jnp.sum(jnp.zeros((T,), jnp.float32).at[idxP_T].add(fP)[::7]), x), fP)
    # 3 fused same-index scatters vs separate (measures per-op overhead)
    def scat3(x):
        a = jnp.zeros((P,), jnp.float32).at[idxN_P].set(fN)
        b = jnp.zeros((P,), jnp.float32).at[idxN_P].set(fN + 1)
        c = jnp.zeros((P,), jnp.float32).at[idxN_P].set(fN + 2)
        return chain(jnp.sum(a[::997] + b[::997] + c[::997]), x)
    run("scatter1d_N_into_P_x3", scat3, fP)

    # --- scans -----------------------------------------------------------
    run("cumsum_P_f32", lambda x: chain(jnp.sum(jnp.cumsum(fP)[::997]), x), fP)
    run("cumsum_P_i32", lambda x: chain(jnp.sum(jnp.cumsum(i32P)[::997]).astype(jnp.float32), x), fP)
    run("cummax_P_i32", lambda x: chain(
        jnp.sum(jax.lax.cummax(i32P)[::997]).astype(jnp.float32), x), fP)
    run("cumsum_N_f32", lambda x: chain(jnp.sum(jnp.cumsum(fN)[::97]), x), fP)
    # blocked 2-level cumsum alternative
    def cumsum_blocked(x):
        xb = fP.reshape(-1, 4096)
        loc = jnp.cumsum(xb, axis=1)
        car = jnp.cumsum(loc[:, -1])
        out = loc + jnp.pad(car, (1, 0))[:-1, None]
        return chain(jnp.sum(out[::997, -1]), x)
    run("cumsum_P_blocked4096", cumsum_blocked, fP)
    # dense (R,60) f32 cumsum along rows (the rank-matrix candidate)
    R = P // 2
    mat = jnp.ones((R // 128, 128), jnp.float32)
    def cums_mat(x):
        m = jnp.broadcast_to(fP[:R][:, None], (R, 60))
        c = jnp.cumsum(m, axis=0)
        return chain(jnp.sum(c[::997, ::7]), x)
    run("cumsum_(R,60)_axis0", cums_mat, fP)

    # --- sorts -----------------------------------------------------------
    run("sort_P_1key", lambda x: chain(
        jnp.sum(jax.lax.sort(i32P)[::997]).astype(jnp.float32), x), fP, n=4)
    run("sort_P_1key_2pay", lambda x: chain(
        jnp.sum(jax.lax.sort((i32P, idxP_P, idxP_N), num_keys=1,
                             is_stable=True)[0][::997]).astype(jnp.float32), x),
        fP, n=4)
    run("argsort_N_f32", lambda x: chain(
        jnp.sum(jnp.argsort(fN)[::97]).astype(jnp.float32), x), fP, n=4)
    Rr = P // 2
    run("sort_R_1key_3pay", lambda x: chain(
        jnp.sum(jax.lax.sort((i32P[:Rr], idxP_P[:Rr], idxP_N[:Rr], i32P[:Rr]),
                             num_keys=1, is_stable=True)[0][::997]
                ).astype(jnp.float32), x), fP, n=4)

    # --- searchsorted (tile ranges) ---------------------------------------
    run("searchsorted_T_into_P", lambda x: chain(
        jnp.sum(jnp.searchsorted(keyP, jnp.arange(T, dtype=jnp.int32)
                                 ).astype(jnp.float32)), x), fP)

    # --- forward-fill ------------------------------------------------------
    from gs2d_tpu.ops.rasterize.binning import _ffill_k
    flag = (idxP_P % 7) == 0
    def ff1(x):
        (v,) = _ffill_k(flag, fP)
        return chain(jnp.sum(v[::997]), x)
    run("ffill_P_1col", ff1, fP)
    def ff14(x):
        vs = _ffill_k(flag, *([fP] * 14))
        return chain(sum(jnp.sum(v[::997]) for v in vs), x)
    run("ffill_P_14col", ff14, fP)


if __name__ == "__main__":
    print(json.dumps({"P": P, "N": N, "devices": str(jax.devices())}),
          flush=True)
    main()
