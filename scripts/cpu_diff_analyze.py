"""Analyze where the TPU forward deviates from the oracle (channel/tile)."""
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax.numpy as jnp
import numpy as np
from gs2d_tpu.ops.rasterize.oracle import rasterize_oracle
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from utils import lookat_camera, random_cloud

cam = lookat_camera(width=512, height=256)
means, scales, quats, opac, rgb, noise = random_cloud(2000, 0)
pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
                 cam.width, cam.height, colors=jnp.asarray(rgb),
                 noise=jnp.asarray(noise))
ref = np.asarray(rasterize_oracle(pre, cam.width, cam.height))
tpu = np.load("/tmp/tpu_fwd.npy")
diff = np.abs(ref - tpu)
names = ["r","g","b","D","alpha","nx","ny","nz","med","dist","z0","z1","z2","M1","M2"]
for c in range(15):
    print(f"ch {names[c]:5s} max {diff[c].max():.4e} mean {diff[c].mean():.2e} frac>1e-3 {(diff[c]>1e-3).mean():.4f}")
# tile map of bad pixels (8x128 tiles)
bad = (diff.max(0) > 1e-3)
tiles = bad.reshape(256 // 8, 8, 512 // 128, 128).any(axis=(1, 3))
print("bad tiles (y,x):")
ys, xs = np.where(tiles)
print(list(zip(ys.tolist(), xs.tolist()))[:40], "total", len(ys))
# where in the tile?
yy, xx = np.where(bad)
print("row-in-tile histogram:", np.bincount(yy % 8, minlength=8))
print("col-in-tile histogram coarse:", np.bincount((xx % 128) // 16, minlength=8))
