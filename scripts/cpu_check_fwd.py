"""Compare the TPU forward output saved by tpu_smoke_fwd.py with the CPU
oracle on the same scene (run after scripts/tpu_smoke_fwd.py)."""
import os
import sys

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
print("max abs diff:", diff.max(), "mean:", diff.mean())
print("mismatch(>1e-3):", (diff > 1e-3).mean())
# median depth (ch 8) is a discrete selection: a 1-ulp transmittance
# difference at the 0.5 boundary flips the chosen splat — allow a few px.
nonmed = np.delete(diff, 8, axis=0)
assert nonmed.max() < 5e-3, "TPU forward deviates from oracle"
assert (diff[8] > 1e-2).mean() < 5e-4, "median depth flips too often"
print("TPU forward matches CPU oracle.")
