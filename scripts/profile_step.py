"""Stage-by-stage timing of the render/train pipeline on the current
backend: preprocess | +binning | +gather | fwd | fwd+bwd.

Uses chained data-dependent iterations (gs2d_tpu.utils.timing) because
on tunneled/async backends block_until_ready does not actually block.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, pack_entries,
                                        rasterize)
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.timing import timed_loop


def run(W, H, N, pairs_cap, label):
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy,
                      W, H)
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
        """Fold a traced scalar back into the inputs for data dependence."""
        eps = 1e-30 * val.astype(jnp.float32)
        return tuple(a + eps for a in args)

    @jax.jit
    def step_pre(args):
        pre = pre_raw(*args)
        return chain(jnp.sum(pre.center2d[:8, 0]), args)

    @jax.jit
    def step_bin(args):
        # consume ALL binning outputs (sampled) — summing only num_pairs
        # lets XLA dead-code-eliminate the whole sort/route pipeline and
        # misattribute its cost to the first consumer.
        pre = pre_raw(*args)
        bins = bin_gaussians(pre.center2d, pre.extent, pre.depth,
                             pre.visible, W, H, pairs_cap, 128)
        s = (jnp.sum(bins.gid[::4096]) + jnp.sum(bins.inv[::4096]) +
             jnp.sum(bins.tile_start[::64]) + jnp.sum(bins.tile_count[::64]))
        return chain(s.astype(jnp.float32), args)

    @jax.jit
    def step_gather(args):
        pre = pre_raw(*args)
        bins = bin_gaussians(pre.center2d, pre.extent, pre.depth,
                             pre.visible, W, H, pairs_cap, 128)
        entries = pack_entries(pre)[bins.gid]     # row-major wire format
        return chain(jnp.sum(entries[::4096]) +
                     jnp.sum(bins.inv[::4096]).astype(jnp.float32),
                     args)

    @jax.jit
    def step_fwd(args):
        pre = pre_raw(*args)
        out, _ = rasterize(pre, cfg)
        return chain(jnp.sum(out[:, ::64, ::64]), args)

    cot = jnp.ones((15, H, W), jnp.float32)

    def loss(m, s, q, o, c):
        out, _ = rasterize(pre_raw(m, s, q, o, c), cfg)
        return jnp.sum(out * cot)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def step_fb(args):
        g = grad(*args)
        return tuple(a - 1e-12 * gi for a, gi in zip(args, g))

    n = 10
    t_pre, _ = timed_loop(step_pre, args0, n=n)
    t_bin, _ = timed_loop(step_bin, args0, n=n)
    t_gather, _ = timed_loop(step_gather, args0, n=n)
    t_fwd, _ = timed_loop(step_fwd, args0, n=n)
    t_fb, _ = timed_loop(step_fb, args0, n=n)

    pre = jax.jit(pre_raw)(*args0)
    bins = jax.jit(lambda p: bin_gaussians(
        p.center2d, p.extent, p.depth, p.visible, W, H, pairs_cap, 128))(pre)
    npairs = int(bins.num_pairs)
    print(f"[{label}] N={N} pairs={npairs} | "
          f"pre {t_pre*1e3:.2f}ms +bin {t_bin*1e3:.2f}ms "
          f"+gather {t_gather*1e3:.2f}ms fwd {t_fwd*1e3:.2f}ms "
          f"fwd+bwd {t_fb*1e3:.2f}ms | "
          f"rays/s fwd+bwd = {W*H/t_fb:.3e}")


if __name__ == "__main__":
    print("backend:", jax.devices())
    run(512, 512, 20_000, 1 << 17, "small")
    run(1920, 1080, 100_000, 1 << 20, "1080p")
    run(1920, 1080, 500_000, 1 << 22, "1080p-large")
