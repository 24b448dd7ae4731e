#!/usr/bin/env python
"""Training CLI.

Same surface as the reference's `python train.py -s <data> -m <out>`
(/root/reference/train.py:252-277) with the reference flag names, plus
TPU-runtime knobs. PSNR/L1 test reports at --test_iterations; PLY saves at
--save_iterations; full-state checkpoints at --checkpoint_iterations.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gs2d_tpu.config import (ModelParams, OptimizationParams, PipelineParams,
                             RuntimeParams, save_cfg_args)


def add_flags(parser):
    m, o, p, r = (ModelParams(), OptimizationParams(), PipelineParams(),
                  RuntimeParams())
    parser.add_argument("--source_path", "-s", type=str, required=True)
    parser.add_argument("--model_path", "-m", type=str, default="")
    parser.add_argument("--images", "-i", type=str, default=m.images)
    parser.add_argument("--resolution", "-r", type=int, default=m.resolution)
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--sh_degree", type=int, default=m.sh_degree)
    parser.add_argument("--eval", action="store_true")
    for f, v in (("iterations", o.iterations),
                 ("position_lr_init", o.position_lr_init),
                 ("position_lr_final", o.position_lr_final),
                 ("position_lr_delay_mult", o.position_lr_delay_mult),
                 ("position_lr_max_steps", o.position_lr_max_steps),
                 ("feature_lr", o.feature_lr), ("opacity_lr", o.opacity_lr),
                 ("scaling_lr", o.scaling_lr),
                 ("rotation_lr", o.rotation_lr),
                 ("percent_dense", o.percent_dense),
                 ("lambda_dssim", o.lambda_dssim),
                 ("lambda_dist", o.lambda_dist),
                 ("lambda_normal", o.lambda_normal),
                 ("opacity_cull", o.opacity_cull),
                 ("densification_interval", o.densification_interval),
                 ("opacity_reset_interval", o.opacity_reset_interval),
                 ("densify_from_iter", o.densify_from_iter),
                 ("densify_until_iter", o.densify_until_iter),
                 ("densify_grad_threshold", o.densify_grad_threshold)):
        parser.add_argument(f"--{f}", type=type(v), default=v)
    parser.add_argument("--depth_ratio", type=float, default=p.depth_ratio)
    parser.add_argument("--initial_capacity", type=int,
                        default=r.initial_capacity)
    parser.add_argument("--pairs_capacity", type=int,
                        default=r.pairs_capacity)
    parser.add_argument("--seed", type=int, default=r.seed)
    parser.add_argument("--interpret", action="store_true",
                        help="Pallas interpreter mode (CPU debugging)")
    parser.add_argument("--data_devices", type=int, default=1,
                        help="pixel-shard the render over N devices")


def main():
    parser = argparse.ArgumentParser(description="gs2d_tpu training")
    add_flags(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--run_log", type=str, default=None,
                        help="append one JSON line per logging tick "
                        "(loss/points/elapsed/peak HBM) — the committed "
                        "artifact of at-scale runs")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax_debug_nans: fail loudly at the first "
                             "NaN-producing op (reference train.py:260)")
    parser.add_argument("--profile", type=str, default=None,
                        help="dump a jax.profiler trace to this dir "
                             "covering iterations 50-60")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--no_viewer", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-process pod training: "
                             "jax.distributed bring-up, global device "
                             "mesh, host-local gt bands, proc-0-only IO "
                             "(parallel/multihost.py)")
    args = parser.parse_args()

    # Distributed bring-up MUST precede any backend-touching JAX call.
    main_proc = True
    if args.multihost:
        from gs2d_tpu.parallel.multihost import (initialize_distributed,
                                                 is_main_process)
        initialize_distributed()
        main_proc = is_main_process()

    import uuid
    if not args.model_path:
        if args.multihost:
            # every process must agree on the directory — derive it
            # deterministically from the scene + seed instead of a
            # per-process random uuid
            tag = uuid.uuid5(uuid.NAMESPACE_URL,
                             f"{args.source_path}|{args.seed}")
            args.model_path = os.path.join("./output", str(tag)[:10])
        else:
            args.model_path = os.path.join("./output",
                                           str(uuid.uuid4())[:10])
    if main_proc:
        os.makedirs(args.model_path, exist_ok=True)

    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)

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
                       pairs_capacity=args.pairs_capacity,
                       seed=args.seed, interpret=args.interpret,
                       devices=args.data_devices)
    if main_proc:        # proc-0-only IO: no concurrent rewrites
        save_cfg_args(os.path.join(args.model_path, "cfg_args.json"),
                      model, pipe, opt)
    args.save_iterations.append(opt.iterations)

    mesh = None
    if args.multihost:
        from gs2d_tpu.parallel.multihost import global_data_mesh
        mesh = global_data_mesh()
    elif args.data_devices > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:args.data_devices]), ("data",))

    from tqdm import tqdm

    from gs2d_tpu.ops.ssim import psnr as psnr_fn
    from gs2d_tpu.train.loop import train

    # TensorBoard (reference train.py:184-198); process-0-only side effect
    tb_writer = None
    if main_proc:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(args.model_path)
        except ImportError:
            print("Tensorboard not available: not logging progress")

    bar = tqdm(total=opt.iterations, desc="Training", disable=not main_proc)
    last = [0]
    last_elapsed = [0.0]
    run_log_f = (open(args.run_log, "a", buffering=1)
                 if args.run_log and main_proc else None)

    def log_fn(iteration, info):
        if run_log_f is not None:
            import json as _json
            run_log_f.write(_json.dumps(
                {"iter": iteration, **info}) + "\n")
        if "event" in info:
            if main_proc:
                bar.write(f"[{iteration}] {info['event']}")
            return
        bar.update(iteration - last[0])
        last[0] = iteration
        bar.set_postfix(loss=f"{info['loss']:.5f}",
                        distort=f"{info['dist']:.5f}",
                        normal=f"{info['normal']:.5f}",
                        points=info["points"])
        if tb_writer is not None:
            tb_writer.add_scalar("train_loss_patches/total_loss",
                                 info["loss"], iteration)
            tb_writer.add_scalar("train_loss_patches/dist_loss",
                                 info["dist"], iteration)
            tb_writer.add_scalar("train_loss_patches/normal_loss",
                                 info["normal"], iteration)
            tb_writer.add_scalar("total_points", info["points"], iteration)
            # per-iteration seconds over the logging window (the raw
            # elapsed_s is cumulative; the reference's iter_time chart
            # is per-iteration)
            d_it = max(iteration - last[0], 1) if iteration > last[0] \
                else 10
            tb_writer.add_scalar(
                "iter_time",
                (info["elapsed_s"] - last_elapsed[0]) / d_it, iteration)
            last_elapsed[0] = info["elapsed_s"]

    import functools

    import jax

    @functools.lru_cache(maxsize=8)
    def _eval_render(width, height):
        from gs2d_tpu.ops.rasterize.api import RasterizeConfig
        from gs2d_tpu.render.renderer import render
        cfg = RasterizeConfig(width=width, height=height,
                              pairs_capacity=rt.pairs_capacity,
                              chunk=rt.chunk, interpret=rt.interpret)
        return jax.jit(lambda cam, state, bg: render(
            cam, state, cfg, bg, max_sh_degree=model.sh_degree,
            depth_ratio=pipe.depth_ratio))

    def report_fn(iteration, ts, scene):
        import jax.numpy as jnp
        import numpy as np

        test_cams = scene.get_test_cameras() or scene.get_train_cameras()[:4]
        bg = jnp.asarray([1.0] * 3 if model.white_background else [0.0] * 3)
        vals = []
        for i, c in enumerate(test_cams[:8]):
            pkg = _eval_render(c.camera.width, c.camera.height)(
                c.camera, ts.gaussians, bg)
            img = jnp.clip(pkg["render"], 0, 1)
            vals.append(float(psnr_fn(img, jnp.asarray(c.image))))
            if tb_writer is not None and i < 5:
                tb_writer.add_images(
                    f"test_view_{c.image_name}/render",
                    np.asarray(img)[None], global_step=iteration)
                d = np.asarray(pkg["surf_depth"])
                tb_writer.add_images(
                    f"test_view_{c.image_name}/depth",
                    (d / max(d.max(), 1e-6))[None], global_step=iteration)
                tb_writer.add_images(
                    f"test_view_{c.image_name}/rend_normal",
                    (np.asarray(pkg["rend_normal"]) * 0.5 + 0.5)[None],
                    global_step=iteration)
        if main_proc:
            bar.write(f"[ITER {iteration}] eval PSNR "
                      f"{sum(vals) / len(vals):.2f} over {len(vals)} views")
        if tb_writer is not None:
            tb_writer.add_scalar("test/psnr", sum(vals) / len(vals),
                                 iteration)

    # live-viewer polling during training (reference train.py:146-168);
    # the TCP socket is a process-0-only side effect
    viewer_fn = None
    if not args.no_viewer and main_proc:
        import numpy as np

        from gs2d_tpu.render.network_gui import (NetworkGUI,
                                                 render_net_image)
        gui = NetworkGUI()
        try:
            gui.init(args.ip, args.port)
        except OSError:
            gui = None

        def viewer_fn(iteration, ts, ema):
            if gui is None:
                return
            import jax.numpy as jnp

            from gs2d_tpu.render.renderer import render as render_fn
            if gui.conn is None:
                gui.try_connect(model.render_items)
            while gui.conn is not None:
                try:
                    cam, do_training, keep_alive, scaling, mode = \
                        gui.receive()
                    img_bytes = None
                    if cam is not None:
                        from gs2d_tpu.ops.rasterize.api import \
                            RasterizeConfig
                        cfg = RasterizeConfig(
                            width=cam.width, height=cam.height,
                            pairs_capacity=rt.pairs_capacity,
                            chunk=rt.chunk, interpret=rt.interpret)
                        bgv = jnp.asarray(
                            [1.0] * 3 if model.white_background
                            else [0.0] * 3)
                        pkg = render_fn(cam, ts.gaussians, cfg, bgv,
                                        max_sh_degree=model.sh_degree,
                                        scaling_modifier=scaling,
                                        depth_ratio=pipe.depth_ratio)
                        net = render_net_image(pkg, model.render_items,
                                               mode, cam)
                        img = (np.clip(net, 0, 1) * 255).astype(np.uint8)
                        img_bytes = memoryview(
                            np.ascontiguousarray(img.transpose(1, 2, 0)))
                    gui.send(img_bytes, model.source_path,
                             {"#": int(ts.gaussians.num_active()),
                              "loss": ema["loss"]})
                    if do_training and (iteration < opt.iterations
                                        or not keep_alive):
                        break
                except Exception:
                    gui.disconnect()

    train(model, opt, pipe, rt,
          test_iterations=args.test_iterations,
          save_iterations=args.save_iterations,
          checkpoint_iterations=args.checkpoint_iterations,
          start_checkpoint=args.start_checkpoint,
          mesh=mesh, multihost=args.multihost,
          log_fn=log_fn, report_fn=report_fn,
          profile_dir=args.profile, viewer_fn=viewer_fn)
    bar.close()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
