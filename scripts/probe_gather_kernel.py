"""Probe: can a Pallas/Mosaic kernel beat XLA's ~20 ns/row row-gather?

Tests, at the trained-scale operating point (N=1M-row table, 24 f32
fields, P=5.6M gathered rows):
  1. XLA baseline: table[idx]  (row gather)
  2. Pallas kernel, full (F, N) f32 table VMEM-resident, per-block
     dynamic gather along lanes (jnp.take axis=1)
  3. Pallas kernel, (N, F) table VMEM-resident, sublane gather
     (table[idx] inside the kernel)
  4. VMEM ceiling probe (how big a table fits)

Run on TPU:  python scripts/probe_gather_kernel.py
"""

import functools
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
    try:
        out = jax.jit(fn)(*args)
        out.block_until_ready()
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None

    def step(state):
        x, = state
        o = jax.jit(fn)(x + 0.0, *args[1:]) if False else None
        return state

    # chained timing: fold output back into the table input
    @jax.jit
    def chained(tbl):
        o = fn(tbl, *args[1:])
        return tbl + 1e-30 * o.ravel()[0]

    dt, _ = timed_loop(lambda t: chained(t), args[0], n=n)
    print(f"{label}: {dt*1e3:.2f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    N = 1 << 20
    P = 5_600_000
    P = (P + 1023) // 1024 * 1024
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((N, F), np.float32))
    idx = jnp.asarray(rng.integers(0, N, P).astype(np.int32))

    # --- 1. XLA baseline row gather
    bench(lambda t, i: t[i], (table, idx), f"xla row gather (P={P})")

    # --- 2. Pallas: (F, N) table in VMEM, lane gather per block
    tableT = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))  # (F, N)
    BLK = 2048

    def lane_gather_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[...]          # (1, BLK) int32
        # gather along lanes: out[f, j] = tbl[f, ids[j]]
        out_ref[...] = jnp.take(tbl_ref[...], ids[0], axis=1)

    def lane_gather(tblT, ids):
        grid = (P // BLK,)
        return pl.pallas_call(
            lane_gather_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(ids.reshape(1, -1), tblT)

    bench(lambda t, i: lane_gather(t, i), (tableT, idx),
          f"pallas lane-gather full-VMEM table (F,N) f32 {F*N*4/2**20:.0f}MB")

    # --- 3. Pallas: (N, F) table in VMEM, sublane gather
    def sub_gather_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[...]          # (1, BLK)
        out_ref[...] = jnp.take(tbl_ref[...], ids[0], axis=0)

    def sub_gather(tbl, ids):
        grid = (P // BLK,)
        return pl.pallas_call(
            sub_gather_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(ids.reshape(1, -1), tbl)

    bench(lambda t, i: sub_gather(t, i), (table, idx),
          "pallas sublane-gather full-VMEM table (N,F)")

    # --- 4. one-hot MXU gather on a blocked table (no VMEM residency
    # constraint; 8 passes over idx for 8 table blocks)
    NB = N // 8

    def onehot_kernel(idx_ref, tbl_ref, out_ref):
        b = pl.program_id(1)
        ids = idx_ref[...][0]                       # (BLK,)
        loc = ids - b * NB
        # accumulate across table-block passes
        @pl.when(b == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        oh = (loc[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (BLK, NB), 1))
        out_ref[...] += jnp.dot(oh.astype(jnp.float32), tbl_ref[...],
                                preferred_element_type=jnp.float32)

    def onehot_gather(tbl, ids):
        grid = (P // BLK, 8)
        return pl.pallas_call(
            onehot_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i, b: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, F), lambda i, b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, F), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, F), jnp.float32),
        )(ids.reshape(1, -1), tbl)

    # one-hot at BLKxNB = 2048x128k is enormous; skip if too big
    # (kept here only as a sanity marker — expected to fail/compile out)
    # bench(lambda t, i: onehot_gather(t, i), (table, idx), "onehot mxu")

    print("done")


if __name__ == "__main__":
    main()
