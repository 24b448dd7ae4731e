"""Hardware train-quality gate: overfit a few hundred splats at 256x256
through the COMPILED Pallas kernels to a PSNR bar (VERDICT r2 item 6 —
the CPU suite covers interpret mode at 128x64; this is the compiled-kernel
equivalent at realistic resolution, run from scripts/tpu_session.sh).

Prints one JSON line {"psnr": ..., "pass": ..., "wall_s": ...}; exit 1 on
a miss so the session log flags it.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.ops.ssim import psnr
from gs2d_tpu.render.renderer import render
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step
from tests.utils import lookat_camera, random_cloud

PSNR_BAR = 30.0


def main():
    t0 = time.time()
    interpret = jax.devices()[0].platform == "cpu"
    W, H = 256, 256
    cam = lookat_camera(width=W, height=H, dist=4.0)
    rcfg = RasterizeConfig(width=W, height=H, pairs_capacity=1 << 16,
                           impl="pallas", interpret=interpret)

    n = 300
    means, scales, quats, opac, rgb, _ = random_cloud(
        n, 5, spread=0.9, scale_lo=0.04, scale_hi=0.15)
    cap = 512
    gt_state = init_from_pcd(means, rgb, cap, init_scales=np.log(scales),
                             seed=0)
    logit = np.log(opac / (1 - opac)).astype(np.float32)[:, None]
    pad = cap - n
    gt_state = dataclasses.replace(
        gt_state,
        params=dataclasses.replace(
            gt_state.params,
            rotation=jnp.asarray(np.pad(quats, ((0, pad), (0, 0)))),
            opacity=jnp.asarray(np.pad(logit, ((0, pad), (0, 0))))),
        active_sh_degree=jnp.int32(0))
    bg = jnp.zeros((3,), jnp.float32)
    gt = render(cam, gt_state, rcfg, bg)["render"]

    rng = np.random.default_rng(7)
    init_pts = means + rng.normal(scale=0.03, size=means.shape).astype(
        np.float32)
    state = init_from_pcd(init_pts, rgb * 0.5 + 0.25, cap,
                          init_scales=np.log(scales), seed=1)
    opt_cfg = OptimizationParams(position_lr_init=0.003,
                                 position_lr_final=0.0003)
    step = make_train_step(rcfg, opt_cfg, spatial_lr_scale=1.0)
    ts = TrainState(gaussians=state, opt=init_adam(state.params),
                    key=jax.random.PRNGKey(0))

    iters = int(os.environ.get("GATE_ITERS", "500"))  # smoke override
    for it in range(1, iters + 1):
        ts, _ = step(ts, cam, gt, jnp.int32(it), bg)

    out = render(cam, ts.gaussians, rcfg, bg)["render"]
    p = float(psnr(out, gt))
    ok = p > PSNR_BAR or iters < 500  # short smoke runs only check plumbing
    print(json.dumps({"psnr": p, "pass": ok, "bar": PSNR_BAR,
                      "platform": jax.devices()[0].platform,
                      "wall_s": round(time.time() - t0, 1)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
