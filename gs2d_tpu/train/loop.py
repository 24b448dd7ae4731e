"""Host-side training driver.

The python counterpart of /root/reference/train.py:31-168: random camera
order, jitted step, densify/prune cadence (every 100 iters in [500,
15000]), opacity reset every 3000 (plus the white-background reset at
densify_from_iter), periodic PLY saves/checkpoints, EMA progress logging.
TPU-specific additions: capacity-bucket growth and pairs-capacity overflow
escalation (both recompile the jitted step, both rare).
"""

from __future__ import annotations

import dataclasses
import os
import random
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (ModelParams, OptimizationParams, PipelineParams,
                      RuntimeParams)
from ..models.densify import densify_and_prune, reset_opacity
from ..models.gaussians import grow_capacity
from ..models.io import save_checkpoint
from ..ops.rasterize.api import RasterizeConfig
from ..scene.scene import Scene
from ..train.optim import init_adam
from ..train.step import TrainState, make_train_step


def train(model: ModelParams, opt: OptimizationParams, pipe: PipelineParams,
          rt: RuntimeParams, *,
          test_iterations: List[int] = (7000, 30000),
          save_iterations: List[int] = (7000, 30000),
          checkpoint_iterations: List[int] = (),
          start_checkpoint: Optional[str] = None,
          mesh=None,
          multihost: bool = False,
          log_fn: Optional[Callable] = None,
          report_fn: Optional[Callable] = None,
          profile_dir: Optional[str] = None,
          viewer_fn: Optional[Callable] = None):
    # Multi-host contract (parallel/multihost.py): every process runs the
    # same step/densify computations on the same seeded camera schedule;
    # ground truth is assembled from host-local row bands; only file
    # writes are gated to process 0.
    if multihost:
        assert mesh is not None, "multihost training requires a global mesh"
        from ..parallel.multihost import (global_gt_from_local_rows,
                                          is_main_process, local_row_range)
        io_ok = is_main_process()
    else:
        io_ok = True
    scene = Scene(model, capacity=rt.initial_capacity, seed=rt.seed)
    gaussians = scene.gaussians
    opt_state = init_adam(gaussians.params)
    first_iter = 0
    if start_checkpoint:
        from ..models.io import load_checkpoint
        gaussians, opt_state, first_iter, _ = load_checkpoint(
            start_checkpoint)

    spatial_lr_scale = scene.cameras_extent
    bg = jnp.asarray([1.0, 1.0, 1.0] if model.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)

    cams = scene.get_train_cameras()
    assert cams, "no training cameras"

    pairs_capacity = rt.pairs_capacity
    final_capacity = None   # post-cull slot capacity; None -> pairs_capacity
    rows_capacity = None    # level-1 row capacity; None -> pairs_capacity
    key = jax.random.PRNGKey(rt.seed)

    # jitted step per (W, H) resolution bucket (COLMAP scenes may mix
    # slightly different image sizes); rebuilt on capacity escalation
    step_fns = {}

    def build_step(w, h):
        rcfg = RasterizeConfig(width=w, height=h,
                               pairs_capacity=pairs_capacity,
                               final_capacity=final_capacity,
                               rows_capacity=rows_capacity,
                               chunk=rt.chunk, interpret=rt.interpret)
        return make_train_step(
            rcfg, opt, max_sh_degree=model.sh_degree,
            spatial_lr_scale=spatial_lr_scale,
            depth_ratio=pipe.depth_ratio, mesh=mesh)

    def step_for(cam):
        wh = (cam.width, cam.height)
        if wh not in step_fns:
            step_fns[wh] = build_step(*wh)
        return step_fns[wh]
    ts = TrainState(gaussians=gaussians, opt=opt_state, key=key)

    ema = {"loss": 0.0, "dist": 0.0, "normal": 0.0}
    stack: List[int] = []
    rng = random.Random(rt.seed)
    gt_cache = {}
    gt_cache_bytes = 0
    max_padded = 0
    max_expanded = 0
    max_rows = 0
    t_start = time.time()

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if profile_dir and iteration == 50:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and iteration == 60:
            jax.block_until_ready(ts.gaussians.params.xyz)
            jax.profiler.stop_trace()
        if not stack:
            stack = list(range(len(cams)))
        cam_idx = stack.pop(rng.randrange(len(stack)))
        cam_data = cams[cam_idx]
        # keep ground-truth images device-resident across epochs (a fresh
        # jnp.asarray re-uploads ~25 MB per 1080p view every iteration;
        # the budget falls back to streaming for datasets larger than HBM)
        gt = gt_cache.get(cam_idx)
        if gt is None:
            if multihost:
                # host-local IO: upload only this process's pixel-row band
                img = np.asarray(cam_data.image)
                r0, r1 = local_row_range(mesh, img.shape[1])
                gt = global_gt_from_local_rows(img[:, r0:r1], mesh,
                                               img.shape[1])
            else:
                gt = jnp.asarray(cam_data.image)
            # charge the PER-PROCESS footprint: a process-sharded global
            # array stores only its addressable shards, so billing the
            # global nbytes would under-fill the cache n_hosts-fold
            try:
                local_bytes = sum(s.data.nbytes
                                  for s in gt.addressable_shards)
            except (AttributeError, TypeError):
                local_bytes = gt.nbytes
            if gt_cache_bytes + local_bytes <= rt.gt_cache_budget:
                gt_cache[cam_idx] = gt
                gt_cache_bytes += local_bytes

        ts, metrics = step_for(cam_data.camera)(
            ts, cam_data.camera, gt, jnp.int32(iteration), bg)

        # densification schedule (train.py:126-135)
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                size_threshold = 20.0 \
                    if iteration > opt.opacity_reset_interval else 0.0
                key, sub = jax.random.split(ts.key if ts.key is not None
                                            else key)
                gs_new, opt_new = densify_and_prune(
                    ts.gaussians, ts.opt, sub,
                    jnp.float32(opt.densify_grad_threshold),
                    jnp.float32(opt.opacity_cull),
                    jnp.float32(scene.cameras_extent),
                    jnp.float32(size_threshold),
                    jnp.float32(opt.percent_dense))
                ts = TrainState(gaussians=gs_new, opt=opt_new, key=key)

                # capacity growth (host-side re-pad, recompiles)
                n_act = int(ts.gaussians.num_active())
                cap = ts.gaussians.capacity
                if n_act > cap / rt.capacity_headroom:
                    new_cap = cap * 2
                    ts = TrainState(
                        gaussians=grow_capacity(ts.gaussians, new_cap),
                        opt=_grow_opt(ts.opt, new_cap), key=ts.key)
                    step_fns.clear()
                    if log_fn:
                        log_fn(iteration,
                               {"event": f"capacity → {new_cap}"})

            if (iteration % opt.opacity_reset_interval == 0
                    or (model.white_background
                        and iteration == opt.densify_from_iter)):
                gs_new, opt_new = reset_opacity(ts.gaussians, ts.opt)
                ts = TrainState(gaussians=gs_new, opt=opt_new, key=ts.key)

        # Host syncs are expensive (each device→host pull round-trips the
        # runtime, ~40 ms on tunneled backends); only materialize metrics
        # on the logging cadence, and in ONE batched device_get — five
        # separate float()/bool() pulls cost five round trips.
        if iteration % 10 == 0:
            m = jax.device_get({k: metrics[k] for k in (
                "overflow", "loss", "dist_loss", "normal_loss",
                "num_points", "padded_total", "num_expanded", "num_rows")})
            max_padded = max(max_padded, int(m["padded_total"]))
            max_expanded = max(max_expanded, int(m["num_expanded"]))
            max_rows = max(max_rows, int(m["num_rows"]))
            # Downward adaptation: small scenes don't pay big-scene binning
            # costs (every slot-proportional op scales with the capacity,
            # not the demand — a full step at 2x-loose capacities measured
            # +774 ms at 1M splats/1080p, scripts/profile_full_step.py).
            # First pass at iter 100 with 4x headroom for densification
            # growth; after densification ends the demand is stationary,
            # so re-tighten periodically at 1.3x whenever the capacities
            # sit >=1.6x above the recent peak. Overflow doubling still
            # applies in between; the recompile is rare and amortized.
            retighten = (iteration == 100 or
                         (iteration > opt.densify_until_iter
                          and iteration % 500 == 0))
            if retighten and rt.pairs_capacity_auto:
                slack = 4 if iteration <= opt.densify_until_iter else 1.3
                trigger = 1.0 if iteration == 100 else 1.6

                def fit(need, align):
                    need = max(int(need * slack), align)
                    return ((need + align - 1) // align) * align

                tight = fit(max_expanded, rt.chunk)
                tight_fin = fit(max_padded, rt.chunk)
                tight_rows = fit(max_rows, 128)
                if (tight * trigger < pairs_capacity
                        or tight_fin * trigger < (final_capacity
                                                  or pairs_capacity)
                        or tight_rows * trigger < (rows_capacity
                                                   or pairs_capacity)):
                    pairs_capacity = min(tight, pairs_capacity)
                    final_capacity = min(tight_fin, pairs_capacity)
                    rows_capacity = min(tight_rows, pairs_capacity)
                    step_fns.clear()
                    if log_fn:
                        log_fn(iteration,
                               {"event": f"pairs_capacity ↓ "
                                f"{pairs_capacity}/{final_capacity}"
                                f"/{rows_capacity}"})
                # the retighten window looks at RECENT demand, not the
                # all-time peak (densification-era spikes never recur)
                max_padded = max_expanded = max_rows = 0
            if bool(m["overflow"]):
                from ..ops.rasterize.binning import MAX_PAIRS_CAPACITY
                if pairs_capacity >= MAX_PAIRS_CAPACITY:
                    raise RuntimeError(
                        "pair demand exceeds the f32-exact bookkeeping "
                        f"ceiling (2^24); at iteration {iteration} with "
                        f"{int(m['num_points'])} points — reduce "
                        "resolution or densification pressure")
                pairs_capacity = min(pairs_capacity * 2,
                                     MAX_PAIRS_CAPACITY)
                final_capacity = (None if final_capacity is None
                                  else min(2 * final_capacity,
                                           pairs_capacity))
                rows_capacity = (None if rows_capacity is None
                                 else min(2 * rows_capacity,
                                          pairs_capacity))
                step_fns.clear()
                if log_fn:
                    log_fn(iteration,
                           {"event": f"pairs_capacity → "
                            f"{pairs_capacity}/{final_capacity}"})
            ema["loss"] = 0.4 * float(m["loss"]) + 0.6 * ema["loss"]
            ema["dist"] = (0.4 * float(m["dist_loss"])
                           + 0.6 * ema["dist"])
            ema["normal"] = (0.4 * float(m["normal_loss"])
                             + 0.6 * ema["normal"])
            if log_fn:
                rec = {
                    "loss": ema["loss"], "dist": ema["dist"],
                    "normal": ema["normal"],
                    "points": int(m["num_points"]),
                    "elapsed_s": time.time() - t_start,
                }
                if iteration % 500 == 0:
                    try:  # device allocator stats (absent on some backends)
                        ms = jax.local_devices()[0].memory_stats() or {}
                        if "peak_bytes_in_use" in ms:
                            rec["peak_hbm_gb"] = (
                                ms["peak_bytes_in_use"] / 2**30)
                    except Exception:
                        pass
                log_fn(iteration, rec)
        if report_fn and iteration in test_iterations:
            report_fn(iteration, ts, scene)
        if iteration in save_iterations and scene.model_path and io_ok:
            scene.save(iteration, ts.gaussians)
        if iteration in checkpoint_iterations and scene.model_path and io_ok:
            save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.npz"),
                ts.gaussians, ts.opt, iteration, spatial_lr_scale)
        if viewer_fn is not None:
            viewer_fn(iteration, ts, ema)

    return ts, scene


def _grow_opt(opt, new_cap):
    from ..train.optim import AdamState

    def pad(x):
        # device-side (multi-host-safe), mirroring models.grow_capacity
        x = jnp.asarray(x)
        zeros = jnp.zeros((new_cap - x.shape[0],) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, zeros], axis=0)

    return AdamState(mu=jax.tree_util.tree_map(pad, opt.mu),
                     nu=jax.tree_util.tree_map(pad, opt.nu),
                     step=opt.step)
