"""Jitted training step.

One fused XLA program per iteration — render, losses, backward, masked
Adam, densification statistics — mirroring the reference hot loop
(/root/reference/train.py:54-140) with its exact loss schedule:
loss = (1−λ_dssim)·L1 + λ_dssim·(1−SSIM) + λ_dist·mean(dist) (iter>3000)
     + λ_normal·mean(1 − n_rend·n_surf) (iter>7000).

The screen-space densification gradient is obtained by differentiating
w.r.t. an all-zeros screen-offset input (see preprocess.py) instead of the
reference's retain_grad dummy tensor.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import OptimizationParams
from ..models.densify import add_densification_stats
from ..models.gaussians import GaussianState
from ..ops.rasterize.api import RasterizeConfig
from ..ops.ssim import l1_loss, ssim
from ..render.renderer import render
from ..utils.general import expon_lr
from .optim import AdamState, adam_step, make_lrs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    gaussians: GaussianState
    opt: AdamState
    key: Any  # PRNGKey


def make_train_step(rcfg: RasterizeConfig, opt_cfg: OptimizationParams,
                    *, max_sh_degree: int = 3,
                    spatial_lr_scale: float = 1.0,
                    depth_ratio: float = 0.0,
                    mesh=None):
    """Builds the jitted step fn (recompiles per capacity bucket)."""
    from ..parallel.gaussian_parallel import (check_capacity,
                                              shard_capacity_tree)

    @jax.jit
    def train_step(ts: TrainState, camera, gt_image, iteration, bg,
                   lr_iteration=None):
        # lr_iteration: separate clock for the xyz LR schedule — the
        # IG2G fork RESTARTS it at ip2p_start_iter (reference
        # train_ig2g.py:205-206) while every other schedule (SH ramp,
        # loss warmups) keeps the raw iteration
        gs = ts.gaussians
        cap = gs.capacity
        check_capacity(cap, mesh)   # even gauss-axis shards (trace-time)
        # phase-B parameter sharding: slot-capacity arrays live split along
        # the mesh's "gauss" axis (no-op otherwise — same program)
        gs = dataclasses.replace(
            gs, params=shard_capacity_tree(gs.params, mesh))
        # SH degree ramp: +1 every 1000 iterations (train.py:61-62)
        gs = dataclasses.replace(
            gs, active_sh_degree=jnp.minimum(
                iteration // 1000, max_sh_degree).astype(jnp.int32))

        def loss_fn(params, offsets):
            state = dataclasses.replace(gs, params=params)
            pkg = render(camera, state, rcfg, bg,
                         max_sh_degree=max_sh_degree,
                         screen_offsets=offsets, depth_ratio=depth_ratio,
                         mesh=mesh)
            image = pkg["render"]
            ll1 = l1_loss(image, gt_image)
            ssim_v = ssim(image, gt_image)
            base = ((1.0 - opt_cfg.lambda_dssim) * ll1
                    + opt_cfg.lambda_dssim * (1.0 - ssim_v))

            lam_n = jnp.where(iteration > 7000, opt_cfg.lambda_normal, 0.0)
            lam_d = jnp.where(iteration > 3000, opt_cfg.lambda_dist, 0.0)
            normal_err = 1.0 - jnp.sum(
                pkg["rend_normal"] * pkg["surf_normal"], axis=0)
            normal_loss = lam_n * jnp.mean(normal_err)
            dist_loss = lam_d * jnp.mean(pkg["rend_dist"])
            total = base + normal_loss + dist_loss
            aux = {
                "l1": ll1, "ssim": ssim_v, "loss": base,
                "dist_loss": dist_loss, "normal_loss": normal_loss,
                "radii": pkg["radii"], "overflow": pkg["overflow"],
                "num_pairs": pkg["num_pairs"],
                "padded_total": pkg["padded_total"],
                "num_expanded": pkg["num_expanded"],
                "num_rows": pkg["num_rows"],
            }
            return total, aux

        offsets0 = shard_capacity_tree(jnp.zeros((cap, 2), jnp.float32),
                                       mesh)
        (total, aux), (gparams, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(gs.params, offsets0)
        gparams = shard_capacity_tree(gparams, mesh)

        xyz_lr = expon_lr(
            iteration if lr_iteration is None else lr_iteration,
            opt_cfg.position_lr_init * spatial_lr_scale,
            opt_cfg.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps)
        lrs = make_lrs(xyz_lr,
                       feature_lr=opt_cfg.feature_lr,
                       opacity_lr=opt_cfg.opacity_lr,
                       scaling_lr=opt_cfg.scaling_lr,
                       rotation_lr=opt_cfg.rotation_lr)
        new_params, new_opt = adam_step(gs.params, gparams, ts.opt, lrs,
                                        gs.active)
        # On binning overflow the render dropped pair-list tails and the
        # gradients are truncated — make the step a no-op ON DEVICE so no
        # corrupt update lands during the (host-cadenced, up to 10 iters
        # late) overflow detection + capacity regrowth.
        ok = jnp.logical_not(aux["overflow"])

        def keep(new, old):
            return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

        new_params = keep(new_params, gs.params)
        new_opt = keep(new_opt, ts.opt)
        new_params = shard_capacity_tree(new_params, mesh)
        new_opt = shard_capacity_tree(new_opt, mesh)

        gs = dataclasses.replace(gs, params=new_params)
        # radii=0 ⇒ "nothing visible": stats (incl. denom) don't accumulate
        gs = add_densification_stats(
            gs, goff, jnp.where(ok, aux["radii"], 0),
            rcfg.width, rcfg.height)
        # keep the densify-stat arrays on the same shards as the params
        gs = dataclasses.replace(
            gs,
            max_radii2d=shard_capacity_tree(gs.max_radii2d, mesh),
            grad_accum=shard_capacity_tree(gs.grad_accum, mesh),
            denom=shard_capacity_tree(gs.denom, mesh))

        metrics = {
            "total_loss": total, "l1": aux["l1"], "ssim": aux["ssim"],
            "loss": aux["loss"], "dist_loss": aux["dist_loss"],
            "normal_loss": aux["normal_loss"],
            "num_points": gs.num_active(),
            "overflow": aux["overflow"], "num_pairs": aux["num_pairs"],
            "padded_total": aux["padded_total"],
            "num_expanded": aux["num_expanded"],
            "num_rows": aux["num_rows"],
            "xyz_lr": xyz_lr,
        }
        return TrainState(gaussians=gs, opt=new_opt, key=ts.key), metrics

    return train_step
