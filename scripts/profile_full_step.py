"""Decompose the FULL jitted train step at trained scale (VERDICT r4 #3).

RUNLOG_500k showed ~1.8 s per full step at 1.34M splats where the
rasterizer bench predicts ~0.6 s. This script times, at N=1M trained-like
splats / 1080p on the current backend:

  raster_grad   — grad of sum(rasterize·cot)          (= the bench point)
  loss_grad     — grad of the REAL loss (renderer bridge extras, SSIM,
                  L1, dist/normal losses)
  full_step     — make_train_step (adds Adam, overflow-keep, densify
                  stats, metrics)
  full_step@run — full step at the 500k run's ESCALATED capacities
                  (pairs 11.7M vs the tight probe) — capacity-sized
                  streams scale with capacity, not demand
  densify/100   — densify_and_prune amortized over its 100-iter cadence

Usage: python scripts/profile_full_step.py [--n 1000000]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import GaussianParams, GaussianState
from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, rasterize,
                                        suggest_capacities)
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.ops.sh import rgb_to_sh
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop


def build_state(n, cap, max_sh_degree=3):
    means, scales, quats, opac, rgb = make_trained_like_scene(n)
    K = (max_sh_degree + 1) ** 2

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    opac = np.clip(opac, 1e-4, 1 - 1e-4)
    params = GaussianParams(
        xyz=pad(means),
        features_dc=pad(np.asarray(rgb_to_sh(rgb))[:, None, :]),
        features_rest=jnp.zeros((cap, K - 1, 3), jnp.float32),
        scaling=pad(np.log(scales)),
        rotation=pad(quats, fill=1.0),
        opacity=pad(np.log(opac / (1 - opac))[:, None]),
    )
    active = jnp.asarray(np.arange(cap) < n)
    zeros = jnp.zeros((cap,), jnp.float32)
    return GaussianState(params=params, active=active,
                         active_sh_degree=jnp.int32(3),
                         max_radii2d=zeros, grad_accum=zeros, denom=zeros)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    W, H = 1920, 1080
    n = args.n
    cap = 1 << max(17, math.ceil(math.log2(n * 1.25)))
    gs = build_state(n, cap)

    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    gt = jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32))
    bg = jnp.zeros((3,), jnp.float32)
    opt_cfg = OptimizationParams(lambda_dist=10.0)

    # tight capacities from the probe (what bench.py uses)
    from gs2d_tpu.models.gaussians import activated
    xyz, scales, quats, opac, shs = activated(gs.params)
    opac = jnp.where(gs.active, opac, 0.0)
    pre = jax.jit(lambda *a: preprocess(
        a[0], a[1], a[2], a[3], cam.world_view, cam.full_proj, cam.campos,
        W, H, sh_degree=3, shs=a[4]))(xyz, scales, quats, opac, shs)
    pcap, fcap, rcap = suggest_capacities(pre, W, H)
    print(f"N={n} cap={cap} tight pairs/final/rows = {pcap}/{fcap}/{rcap}",
          flush=True)

    results = {}

    def run(label, fn, state, n_it=args.iters):
        t0 = time.time()
        dt, _ = timed_loop(fn, state, n=n_it)
        results[label] = dt
        print(f"{label:>22}: {dt*1e3:8.1f} ms   "
              f"(wall incl compile {time.time()-t0:.0f}s)", flush=True)
        return dt

    # --- 1. bench-equivalent rasterizer grad at tight caps
    rcfg_t = RasterizeConfig(width=W, height=H, pairs_capacity=pcap,
                             final_capacity=fcap, rows_capacity=rcap)
    cot = jnp.ones((15, H, W), jnp.float32)

    def raster_loss(p):
        from gs2d_tpu.models.gaussians import sh_table_kn
        xyz, scales, quats, opac, _ = activated(p)
        opac = jnp.where(gs.active, opac, 0.0)
        pr = preprocess(xyz, scales, quats, opac, cam.world_view,
                        cam.full_proj, cam.campos, W, H, sh_degree=3,
                        shs_kn=sh_table_kn(p))
        out, _ = rasterize(pr, rcfg_t)
        return jnp.sum(out * cot)

    rgrad = jax.jit(jax.grad(raster_loss))

    def raster_step(p):
        g = rgrad(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    run("raster_grad", raster_step, gs.params)

    # --- 2. real loss grad (renderer extras + SSIM + schedule losses)
    from gs2d_tpu.ops.ssim import l1_loss, ssim
    from gs2d_tpu.render.renderer import render
    import dataclasses as dc

    def full_loss(p):
        state = dc.replace(gs, params=p)
        pkg = render(cam, state, rcfg_t, bg, max_sh_degree=3,
                     depth_ratio=1.0)
        image = pkg["render"]
        base = 0.8 * l1_loss(image, gt) + 0.2 * (1.0 - ssim(image, gt))
        nrm = jnp.mean(1.0 - jnp.sum(
            pkg["rend_normal"] * pkg["surf_normal"], axis=0))
        dist = jnp.mean(pkg["rend_dist"])
        return base + 0.05 * nrm + 10.0 * dist

    lgrad = jax.jit(jax.grad(full_loss))

    def loss_step(p):
        g = lgrad(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    run("loss_grad", loss_step, gs.params)

    # --- 3. full train step, tight caps
    ts0 = TrainState(gaussians=gs, opt=init_adam(gs.params),
                     key=jax.random.PRNGKey(0))
    it = jnp.int32(8000)

    step_t = make_train_step(rcfg_t, opt_cfg, max_sh_degree=3,
                             spatial_lr_scale=1.0, depth_ratio=1.0)

    def full_step(ts):
        ts2, _ = step_t(ts, cam, gt, it, bg)
        return ts2

    run("full_step(tight)", full_step, ts0)

    # --- 4. full step at the 500k run's escalated capacities
    rcfg_e = RasterizeConfig(width=W, height=H, pairs_capacity=11709440,
                             final_capacity=11709440, rows_capacity=4014080)
    step_e = make_train_step(rcfg_e, opt_cfg, max_sh_degree=3,
                             spatial_lr_scale=1.0, depth_ratio=1.0)

    def full_step_e(ts):
        ts2, _ = step_e(ts, cam, gt, it, bg)
        return ts2

    run("full_step(escalated)", full_step_e, ts0)

    # --- 5. densify_and_prune amortized
    from gs2d_tpu.models.densify import densify_and_prune

    def dens_step(state):
        ts, k = state
        k, sub = jax.random.split(k)
        gs2, opt2 = densify_and_prune(
            ts.gaussians, ts.opt, sub, jnp.float32(2e-4), jnp.float32(0.05),
            jnp.float32(1.0), jnp.float32(20.0), jnp.float32(0.01))
        return (TrainState(gaussians=gs2, opt=opt2, key=ts.key), k)

    d = run("densify", dens_step, (ts0, jax.random.PRNGKey(1)), n_it=4)
    print(f"{'densify/100 amortized':>22}: {d*10:8.2f} ms", flush=True)

    print("\nsummary deltas:")
    print(f"  renderer+losses vs raster cot : "
          f"{(results['loss_grad']-results['raster_grad'])*1e3:+.1f} ms")
    print(f"  adam+stats+keep               : "
          f"{(results['full_step(tight)']-results['loss_grad'])*1e3:+.1f} ms")
    print(f"  capacity escalation           : "
          f"{(results['full_step(escalated)']-results['full_step(tight)'])*1e3:+.1f} ms")


if __name__ == "__main__":
    main()
