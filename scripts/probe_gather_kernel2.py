"""Probe 2: Mosaic in-kernel dynamic gather via take_along_axis shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2d_tpu.utils.timing import timed_loop

F = 24


def bench(fn, args, label, n=10):
    t0 = time.time()
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None

    @jax.jit
    def chained(tbl):
        o = fn(tbl, *args[1:])
        return tbl + 1e-30 * o.ravel()[0]

    dt, _ = timed_loop(lambda t: chained(t), args[0], n=n)
    print(f"{label}: {dt*1e3:.2f} ms  (compile {time.time()-t0:.0f}s)")
    return dt


def main():
    print("devices:", jax.devices())
    N = 1 << 20
    P = 5_600_256
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((N, F), np.float32))
    tableT = jnp.asarray(rng.random((F, N), np.float32))
    idx = jnp.asarray(rng.integers(0, N, P).astype(np.int32))

    BLK = 2048

    # --- lane gather with take_along_axis: idx broadcast over sublanes
    def lane_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[...]                       # (8, BLK) replicated rows
        ids_f = jnp.broadcast_to(ids[0:1], (F, BLK))
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], ids_f, axis=1)

    def lane_gather(tblT, ids8):
        return pl.pallas_call(
            lane_kernel,
            grid=(P // BLK,),
            in_specs=[
                pl.BlockSpec((8, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(ids8, tblT)

    idx8 = jnp.broadcast_to(idx[None, :], (8, P))
    bench(lambda t, i: lane_gather(t, i), (tableT, idx8),
          "lane take_along_axis, (F,N) table VMEM")

    # --- sublane gather: table (N, F), take_along_axis axis=0
    def sub_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[...]                       # (BLK, F)? need (BLK,F)
        out_ref[...] = jnp.take_along_axis(tbl_ref[...], ids, axis=0)

    def sub_gather(tbl, idsBF):
        return pl.pallas_call(
            sub_kernel,
            grid=(P // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(idsBF, tbl)

    idxBF = jnp.broadcast_to(idx[:, None], (P, F))
    bench(lambda t, i: sub_gather(t, i), (table, idxBF),
          "sublane take_along_axis, (N,F) table VMEM")

    print("done")


if __name__ == "__main__":
    main()
