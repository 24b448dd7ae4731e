"""Isolate the fwd-path glue costs: gather, transpose, untile, bwd glue.

Chained-iteration timing (block_until_ready is unreliable on axon).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, _gather_barrier,
                                        pack_entries, untile)
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.timing import timed_loop


def run(W, H, N, pairs_cap, label):
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.03, (N, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)).astype(np.float32))
    rgb = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    cfg = RasterizeConfig(width=W, height=H, pairs_capacity=pairs_cap,
                          chunk=128)
    args0 = (means, scales, quats, opac, rgb)

    def pre_raw(m, s, q, o, c):
        return preprocess(m, s, q, o, cam.world_view, cam.full_proj,
                          cam.campos, W, H, colors=c)

    def chain(val, args):
        eps = 1e-30 * val.astype(jnp.float32)
        return tuple(a + eps for a in args)

    def upto_gather(args, transpose, kernel, do_untile=False,
                    barrier_gid=False):
        pre = pre_raw(*args)
        bins = bin_gaussians(pre.center2d, pre.extent, pre.depth,
                             pre.visible, W, H, pairs_cap, cfg.chunk)
        packed = _gather_barrier(pack_entries(pre))
        gid = (jax.lax.optimization_barrier(bins.gid) if barrier_gid
               else bins.gid)
        g = packed[gid]
        if transpose and not kernel:
            g = g.T
        if kernel:
            gb = g.reshape(-1, cfg.chunk, g.shape[1]).transpose(0, 2, 1)
            out, _ = rasterize_fwd_pallas(
                gb, bins.tile_start, bins.tile_count,
                width=W, height=H, chunk=cfg.chunk)
            if do_untile:
                img = untile(out, W, H)
                return chain(jnp.sum(img[:, ::64, ::64]), args)
            return chain(jnp.sum(out[:, :, :8]), args)
        return chain(jnp.sum(g[:, :8]) if not transpose
                     else jnp.sum(g[:, :128]), args)  # row/col slice resp.

    import functools
    steps = {
        "gather": jax.jit(functools.partial(upto_gather, transpose=False,
                                            kernel=False)),
        "gather(bar-gid)": jax.jit(functools.partial(
            upto_gather, transpose=False, kernel=False, barrier_gid=True)),
        "fwd(bar-gid)": jax.jit(functools.partial(
            upto_gather, transpose=False, kernel=True, do_untile=True,
            barrier_gid=True)),
        "gather+T": jax.jit(functools.partial(upto_gather, transpose=True,
                                              kernel=False)),
        "gather+kernel": jax.jit(functools.partial(upto_gather,
                                                   transpose=False,
                                                   kernel=True)),
        "full fwd": jax.jit(functools.partial(upto_gather, transpose=False,
                                              kernel=True, do_untile=True)),
    }
    msg = [f"[{label}] N={N}"]
    for name, fn in steps.items():
        t, _ = timed_loop(fn, args0, n=10)
        msg.append(f"{name} {t*1e3:.2f}ms")
    print(" | ".join(msg))


if __name__ == "__main__":
    print("backend:", jax.devices())
    run(1920, 1080, 100_000, 1 << 20, "1080p")
    run(1920, 1080, 500_000, 1 << 22, "1080p-large")
