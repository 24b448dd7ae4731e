"""Time the Pallas fwd / bwd kernels in isolation at 1080p on hardware.

Builds one representative binned scene, freezes entries, then times just
the kernel calls (chained through an epsilon feedback for async-safe
timing).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import pack_entries
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.timing import timed_loop


def main():
    W, H, N = 1920, 1080, 100_000
    cap, chunk = 1 << 20, 128
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.03, (N, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)).astype(np.float32))
    rgb = jnp.asarray(rng.random((N, 3)).astype(np.float32))

    pre = jax.jit(lambda *a: preprocess(
        a[0], a[1], a[2], a[3], cam.world_view, cam.full_proj, cam.campos,
        W, H, colors=a[4]))(means, scales, quats, opac, rgb)
    bins = jax.jit(lambda p: bin_gaussians(
        p.center2d, p.extent, p.depth, p.visible, W, H, cap, chunk))(pre)
    packed = jax.jit(pack_entries)(pre)
    entries = jnp.asarray(np.ascontiguousarray(
        np.asarray(packed)[np.asarray(bins.gid)]
        .reshape(-1, chunk, 24).transpose(0, 2, 1)))
    ts, tc = bins.tile_start, bins.tile_count
    print("pairs:", int(bins.num_pairs),
          "P_alloc:", entries.shape[0] * chunk,
          "padded work:", int(np.asarray(tc).sum()),
          "padded slots:", int((np.ceil(np.asarray(tc) / chunk) * chunk).sum()))

    fwd = lambda e: rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                         chunk=chunk)

    @jax.jit
    def step_fwd(e):
        out, _ = fwd(e)
        return e + 1e-30 * jnp.sum(out[::997, :, ::97])

    t, _ = timed_loop(step_fwd, entries, n=10)
    print(f"fwd kernel: {t*1e3:.2f} ms")

    out_tiles, med_tiles = jax.jit(fwd)(entries)
    g_tiles = jnp.ones_like(out_tiles)

    @jax.jit
    def step_bwd(e):
        d = rasterize_bwd_pallas(e, ts, tc, out_tiles, g_tiles, med_tiles,
                                 width=W, height=H, chunk=chunk)
        return e + 1e-30 * jnp.sum(d[::503])

    t, _ = timed_loop(step_bwd, entries, n=10)
    print(f"bwd kernel: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
