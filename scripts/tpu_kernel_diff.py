"""Isolate hardware-vs-interpret kernel deviations.

Phase 1 (default env, axon TPU): build the smoke scene, preprocess + bin,
pack entries, run the HARDWARE forward kernel, save inputs + outputs.

Phase 2 (JAX_PLATFORMS=cpu): load the saved inputs, run the INTERPRET
forward kernel on the exact same entries, print per-channel deviation.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PATH = "/tmp/tpu_kernel_diff.npz"


def build():
    from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, pack_entries,
                                            untile)
    from gs2d_tpu.ops.rasterize.binning import bin_gaussians
    from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
    from gs2d_tpu.ops.rasterize.preprocess import preprocess
    from gs2d_tpu.scene.cameras import make_camera

    W, H, N = 512, 256, 2000
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    rng = np.random.default_rng(7)
    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.01, 0.12, (N, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.95, (N,)).astype(np.float32))
    rgb = jnp.asarray(rng.random((N, 3)).astype(np.float32))

    pre = jax.jit(lambda *a: preprocess(
        a[0], a[1], a[2], a[3], cam.world_view, cam.full_proj, cam.campos,
        W, H, colors=a[4]))(means, scales, quats, opac, rgb)
    bins = jax.jit(lambda p: bin_gaussians(
        p.center2d, p.extent, p.depth, p.visible, W, H, 1 << 17, 128))(pre)
    packed = jax.jit(pack_entries)(pre)
    entries = np.asarray(packed)[np.asarray(bins.gid)]
    entries = np.ascontiguousarray(
        entries.astype(np.float32).reshape(-1, 128, 24).transpose(0, 2, 1))
    ts = np.asarray(bins.tile_start)
    tc = np.asarray(bins.tile_count)

    from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas

    on_hw = jax.devices()[0].platform != "cpu"
    out_tiles, med_tiles = rasterize_fwd_pallas(
        jnp.asarray(entries), jnp.asarray(ts), jnp.asarray(tc),
        width=W, height=H, chunk=128, interpret=not on_hw)
    g_tiles = jnp.ones_like(out_tiles)
    d_entries = rasterize_bwd_pallas(
        jnp.asarray(entries), jnp.asarray(ts), jnp.asarray(tc),
        out_tiles, g_tiles, med_tiles, width=W, height=H, chunk=128,
        interpret=not on_hw)
    out = np.asarray(untile(out_tiles, W, H))
    if on_hw:
        np.savez(PATH, entries=entries, ts=ts, tc=tc, out=out,
                 out_tiles=np.asarray(out_tiles),
                 med_tiles=np.asarray(med_tiles),
                 d_entries=np.asarray(d_entries), W=W, H=H)
        print("saved", PATH, "platform", jax.devices()[0].platform)
    return out


def compare():
    from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
    from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
    from gs2d_tpu.ops.rasterize.api import untile

    d = np.load(PATH)
    W, H = int(d["W"]), int(d["H"])
    out_tiles, _ = rasterize_fwd_pallas(
        jnp.asarray(d["entries"]), jnp.asarray(d["ts"]), jnp.asarray(d["tc"]),
        width=W, height=H, chunk=128, interpret=True)
    de_cpu = np.asarray(rasterize_bwd_pallas(
        jnp.asarray(d["entries"]), jnp.asarray(d["ts"]), jnp.asarray(d["tc"]),
        jnp.asarray(d["out_tiles"]), jnp.ones_like(out_tiles),
        jnp.asarray(d["med_tiles"]),
        width=W, height=H, chunk=128, interpret=True))
    de_hw = d["d_entries"]
    # only slots inside some tile's chunk-aligned range are ever written
    # (the API masks the rest with slot_valid before the segment-sum)
    ts_a, tc_a = d["ts"].astype(np.int64), d["tc"].astype(np.int64)
    written = int((ts_a + -(-tc_a // 128) * 128).max()) // 128  # blocks
    de_hw = de_hw[:written]
    de_cpu = de_cpu[:written]
    scale = np.maximum(np.abs(de_cpu).max(axis=0, keepdims=True), 1e-6)
    rel = np.abs(de_hw - de_cpu) / scale
    print(f"bwd d_entries ({written} written slots): "
          f"max rel-to-fieldmax {rel.max():.3e} "
          f"mean {rel.mean():.3e} frac>1e-3 {(rel > 1e-3).mean():.6f}")
    out_cpu = np.asarray(untile(out_tiles, W, H))
    out_hw = d["out"]
    names = ["r", "g", "b", "D", "alpha", "nx", "ny", "nz", "med", "dist",
             "z0", "z1", "z2", "M1", "M2"]
    for i, nm in enumerate(names):
        dd = np.abs(out_hw[i] - out_cpu[i])
        print(f"ch {nm:5s} max {dd.max():.4e} mean {dd.mean():.2e} "
              f"frac>1e-3 {(dd > 1e-3).mean():.4f}")


if __name__ == "__main__":
    if jax.devices()[0].platform == "cpu" and os.path.exists(PATH):
        compare()
    else:
        build()
