#!/usr/bin/env python
"""InstructGS2GS training CLI: 2DGS optimization with periodic
InstructPix2Pix dataset editing driven by the rasterizer's rendered-noise
channel.

Surface of /root/reference/train_ig2g.py: same skeleton as train.py plus —
after --ip2p_start_iter, on a cadence of ip2p_cycle_iter / num_cameras
iterations — re-render the current camera (with per-Gaussian noise
composited into the rend_noise channel), edit it with IP2P conditioned on
the original image, and substitute the edited image as that camera's GT
(the Iterative Dataset Update of InstructNeRF2NeRF). The SD backend is
pluggable; --editor stub exercises the full pipeline without SD weights
(zero-egress environment).
"""

import argparse
import dataclasses
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from train import add_flags
    ap = argparse.ArgumentParser(description="gs2d_tpu IG2G training")
    add_flags(ap)
    ap.add_argument("--text_prompt", type=str, default="")
    ap.add_argument("--ip2p_start_iter", type=int, default=20000)
    ap.add_argument("--ip2p_cycle_iter", type=int, default=2500)
    ap.add_argument("--ip2p_iter", type=int, default=3)
    ap.add_argument("--guidance_scale", type=float, default=12.5)
    ap.add_argument("--image_guidance_scale", type=float, default=1.5)
    ap.add_argument("--diffusion_steps", type=int, default=20)
    ap.add_argument("--lower_bound", type=float, default=0.7)
    ap.add_argument("--upper_bound", type=float, default=0.98)
    ap.add_argument("--noise_type", type=str, default="None")
    ap.add_argument("--noise_reg", type=str, default="outlier")
    ap.add_argument("--freeu_mode", type=str, default="None")
    ap.add_argument("--lambda_intermediate", type=float, default=1.0)
    # FreeU scaling (reference train_ig2g enables pipe.enable_freeu with
    # these four knobs, arguments/__init__.py fork block)
    ap.add_argument("--is_freeu", action="store_true")
    ap.add_argument("--freeu_s1", type=float, default=0.9)
    ap.add_argument("--freeu_s2", type=float, default=0.2)
    ap.add_argument("--freeu_b1", type=float, default=1.2)
    ap.add_argument("--freeu_b2", type=float, default=1.4)
    ap.add_argument("--editor", choices=["stub", "jax"], default="stub",
                help="jax = real SD UNet+VAE (needs $GS2D_SD_WEIGHTS)")
    ap.add_argument("--save_edited", action="store_true")
    ap.add_argument("--wandb", action="store_true",
                    help="log to Weights & Biases (reference parity, "
                         "train_ig2g.py:610-614); no-op if not installed")
    args = ap.parse_args()

    import uuid
    if not args.model_path:
        args.model_path = os.path.join("./output",
                                       "ig2g_" + str(uuid.uuid4())[:8])
    os.makedirs(args.model_path, exist_ok=True)

    # wandb logging (reference train_ig2g.py:610-614), gated on install
    wandb_run = None
    if args.wandb:
        try:
            import wandb
            wandb_run = wandb.init(project="gs2d_tpu_ig2g",
                                   dir=args.model_path,
                                   config=vars(args))
        except Exception as e:  # not installed / offline — keep training
            print(f"wandb unavailable ({e}); continuing without it")

    import jax
    import jax.numpy as jnp

    from gs2d_tpu.config import (ModelParams, OptimizationParams,
                                 PipelineParams, RuntimeParams,
                                 save_cfg_args)
    from gs2d_tpu.ig2g.ip2p import InstructPix2Pix, IP2PParams
    from gs2d_tpu.models.densify import densify_and_prune, reset_opacity
    from gs2d_tpu.ops.rasterize.api import RasterizeConfig
    from gs2d_tpu.render.renderer import render
    from gs2d_tpu.scene.scene import Scene
    from gs2d_tpu.train.optim import init_adam
    from gs2d_tpu.train.step import TrainState, make_train_step

    model = ModelParams(sh_degree=args.sh_degree,
                        source_path=args.source_path,
                        model_path=args.model_path, images=args.images,
                        resolution=args.resolution,
                        white_background=args.white_background,
                        eval=args.eval)
    opt = OptimizationParams(**{
        f: getattr(args, f) for f in (
            "iterations", "position_lr_init", "position_lr_final",
            "position_lr_delay_mult", "position_lr_max_steps", "feature_lr",
            "opacity_lr", "scaling_lr", "rotation_lr", "percent_dense",
            "lambda_dssim", "lambda_dist", "lambda_normal", "opacity_cull",
            "densification_interval", "opacity_reset_interval",
            "densify_from_iter", "densify_until_iter",
            "densify_grad_threshold")})
    pipe = PipelineParams(depth_ratio=args.depth_ratio)
    rt = RuntimeParams(initial_capacity=args.initial_capacity,
                       pairs_capacity=args.pairs_capacity, seed=args.seed,
                       interpret=args.interpret)
    save_cfg_args(os.path.join(args.model_path, "cfg_args.json"),
                  model, pipe, opt)

    ip2p = InstructPix2Pix(IP2PParams(
        guidance_scale=args.guidance_scale,
        image_guidance_scale=args.image_guidance_scale,
        diffusion_steps=args.diffusion_steps,
        lower_bound=args.lower_bound, upper_bound=args.upper_bound,
        noise_type=args.noise_type, noise_reg=args.noise_reg,
        freeu_mode=args.freeu_mode,
        lambda_intermediate=args.lambda_intermediate,
        is_freeu=args.is_freeu, freeu_s1=args.freeu_s1,
        freeu_s2=args.freeu_s2, freeu_b1=args.freeu_b1,
        freeu_b2=args.freeu_b2,
    ), backend=args.editor, seed=rt.seed)

    # prompt conditioning: the jax editor needs real CLIP embeddings
    # (reference pipe._encode_prompt, train_ig2g.py:236-242); the stub
    # ignores them
    text_embeddings = None
    if args.editor == "jax":
        from gs2d_tpu.ig2g.clip_text import PromptEncoder
        from gs2d_tpu.ig2g.sd_weights import ENV_VAR, weights_root
        root = weights_root()
        if root is None:
            raise SystemExit(f"--editor jax needs {ENV_VAR} pointing at a "
                             "diffusers snapshot")
        text_embeddings = PromptEncoder(root).encode(args.text_prompt)

    scene = Scene(model, capacity=rt.initial_capacity, seed=rt.seed)
    cams = scene.get_train_cameras()
    for c in cams:                       # clone_edited_images (:103-107)
        c.edited_image = c.image.copy()
    W, H = cams[0].camera.width, cams[0].camera.height
    bg = jnp.asarray([1.0] * 3 if model.white_background else [0.0] * 3,
                     jnp.float32)
    rcfg = RasterizeConfig(width=W, height=H,
                           pairs_capacity=rt.pairs_capacity,
                           chunk=rt.chunk, interpret=rt.interpret)
    step_fn = make_train_step(rcfg, opt, max_sh_degree=model.sh_degree,
                              spatial_lr_scale=scene.cameras_extent,
                              depth_ratio=pipe.depth_ratio)
    gaussians = scene.gaussians
    ts = TrainState(gaussians=gaussians, opt=init_adam(gaussians.params),
                    key=jax.random.PRNGKey(rt.seed))

    rng = random.Random(rt.seed)
    noise_key = jax.random.PRNGKey(rt.seed + 1)
    stack = []
    ip2p_iteration = 0
    edit_every = max(int(args.ip2p_cycle_iter / max(len(cams), 1)), 1)

    # jitted edit-phase render — eager dispatch round-trips the runtime
    # per op (seconds/frame on remote backends); recompiles only when the
    # Gaussian capacity bucket grows
    edit_render = jax.jit(lambda cam, st, bg, noise: render(
        cam, st, rcfg, bg, max_sh_degree=model.sh_degree, noise=noise,
        depth_ratio=pipe.depth_ratio))
    from tqdm import tqdm
    bar = tqdm(range(1, opt.iterations + 1), desc="IG2G")

    for iteration in bar:
        if not stack:
            stack = list(range(len(cams)))
        ci = stack.pop(rng.randrange(len(stack)))
        cam_data = cams[ci]

        # periodic dataset edit (reference :232-304)
        if (iteration > args.ip2p_start_iter
                and (edit_every == 1 or iteration % edit_every == 1)
                and ip2p_iteration < args.ip2p_iter * len(cams)):
            noise_key, sub = jax.random.split(noise_key)
            gnoise = jax.random.normal(
                sub, (ts.gaussians.capacity, 3), jnp.float32)
            pkg = edit_render(cam_data.camera, ts.gaussians, bg, gnoise)
            rendered = jnp.clip(pkg["render"], 0, 1)[None]
            rend_noise = pkg["rend_noise"][None]
            original = jnp.asarray(cam_data.image)[None]
            edited = ip2p.edit_image(text_embeddings, rendered, original,
                                     rend_noise)
            # resize back to the render size if the editor changed it —
            # the VAE's ×8 down/up round-trip returns multiple-of-8 dims
            # (reference train_ig2g.py:293-297, bilinear, conditional)
            if edited.shape[2:] != rendered.shape[2:]:
                edited = jax.image.resize(
                    edited, edited.shape[:2] + rendered.shape[2:],
                    method="bilinear")
            cam_data.edited_image = np.asarray(edited[0])
            ip2p_iteration += 1
            if args.save_edited:
                from PIL import Image
                d = os.path.join(args.model_path, "edited")
                os.makedirs(d, exist_ok=True)
                Image.fromarray(
                    (np.asarray(edited[0]).transpose(1, 2, 0) * 255)
                    .astype(np.uint8)).save(
                    os.path.join(d, f"{iteration}_{cam_data.image_name}.png"))

        gt = jnp.asarray(cam_data.edited_image)      # edited GT (:309)
        # xyz LR schedule RESTARTS at the edit-phase start (reference
        # train_ig2g.py:205-206: update_learning_rate(it - start))
        lr_it = (iteration - args.ip2p_start_iter
                 if iteration > args.ip2p_start_iter else iteration)
        ts, metrics = step_fn(ts, cam_data.camera, gt,
                              jnp.int32(iteration), bg,
                              lr_iteration=jnp.int32(lr_it))

        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                size_thr = 20.0 if iteration > opt.opacity_reset_interval \
                    else 0.0
                key, sub = jax.random.split(ts.key)
                gs_new, opt_new = densify_and_prune(
                    ts.gaussians, ts.opt, sub,
                    jnp.float32(opt.densify_grad_threshold),
                    jnp.float32(opt.opacity_cull),
                    jnp.float32(scene.cameras_extent),
                    jnp.float32(size_thr), jnp.float32(opt.percent_dense))
                ts = TrainState(gaussians=gs_new, opt=opt_new, key=key)
            if (iteration % opt.opacity_reset_interval == 0
                    or (model.white_background
                        and iteration == opt.densify_from_iter)):
                gs_new, opt_new = reset_opacity(ts.gaussians, ts.opt)
                ts = TrainState(gaussians=gs_new, opt=opt_new, key=ts.key)

        if iteration % 10 == 0:
            # ONE batched device→host pull (each float()/int() would
            # round-trip the runtime separately, ~40 ms each on tunnels)
            m = jax.device_get({k: metrics[k] for k in
                                ("loss", "total_loss", "num_points")})
            bar.set_postfix(loss=f"{float(m['loss']):.5f}",
                            edits=ip2p_iteration,
                            points=int(m["num_points"]))
            if wandb_run is not None:
                wandb_run.log({
                    "train/loss": float(m["loss"]),
                    "train/total_loss": float(m["total_loss"]),
                    "train/points": int(m["num_points"]),
                    "train/edits": ip2p_iteration,
                }, step=iteration)
        if iteration == opt.iterations:
            scene.save(iteration, ts.gaussians)

    print("\nIG2G training complete.")


if __name__ == "__main__":
    main()
