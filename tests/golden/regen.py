"""Regenerate the golden render (run from repo root after an INTENTIONAL
rasterizer behavior change; inspect the diff it prints before committing).

History:
  r1: original (3-sigma tile-rect truncation).
  r2: opacity-adaptive exact extent — binning rects now cover the full
      alpha-cutoff support (rho <= 2*ln(opa/ALPHA_CUTOFF)), so splats
      composite slightly beyond the old 3-sigma tile ring.
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# same flags as tests/conftest.py so the persistent compile cache hits
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np

from tests.test_golden import GOLDEN, _pre
from gs2d_tpu.ops.rasterize.oracle import rasterize_oracle

cam, pre = _pre()
out = np.asarray(rasterize_oracle(pre, cam.width, cam.height))
if os.path.exists(GOLDEN):
    old = np.load(GOLDEN)["out"]
    d = np.abs(out - old)
    print(f"golden diff: max {d.max():.6f}, mean {d.mean():.8f}, "
          f"changed {(d > 1e-4).mean():.2%}")
np.savez_compressed(GOLDEN, out=out)
print("wrote", GOLDEN)
