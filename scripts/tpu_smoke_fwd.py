"""Smoke: forward Pallas kernel on the real TPU chip vs CPU oracle."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from utils import lookat_camera, random_cloud

print("devices:", jax.devices())
cam = lookat_camera(width=512, height=256)
means, scales, quats, opac, rgb, noise = random_cloud(2000, 0)
pre = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
                 cam.width, cam.height, colors=jnp.asarray(rgb),
                 noise=jnp.asarray(noise))
cfg = RasterizeConfig(width=cam.width, height=cam.height,
                      pairs_capacity=1 << 17, chunk=128, interpret=False)

render = jax.jit(lambda p: rasterize(p, cfg))
t0 = time.time()
out, aux = render(pre)
out.block_until_ready()
print("compile+run", time.time() - t0, "s; pairs:", aux["num_pairs"],
      "overflow:", aux["overflow"])
t0 = time.time()
for _ in range(20):
    out, aux = render(pre)
out.block_until_ready()
print("steady", (time.time() - t0) / 20 * 1e3, "ms/frame")
print("alpha mean", float(out[4].mean()), "rgb mean", float(out[0:3].mean()))
np.save("/tmp/tpu_fwd.npy", np.asarray(out))
