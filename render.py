#!/usr/bin/env python
"""Render + mesh extraction CLI.

Surface of the reference `python render.py -m <model>`
(/root/reference/render.py:28-111): exports train/test renders and vis
maps, optional ellipse-path video, and a TSDF-fused mesh with the
reference's auto parameters (depth_trunc = 2·radius, voxel =
depth_trunc / mesh_res, sdf_trunc = 5·voxel; SH degree forced to 0 for
meshing). Bounded fusion by default, --unbounded for the space-contracted
variant.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description="gs2d_tpu render + mesh")
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--source_path", "-s", default=None)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_test", action="store_true")
    ap.add_argument("--skip_mesh", action="store_true")
    ap.add_argument("--render_path", action="store_true")
    ap.add_argument("--voxel_size", type=float, default=-1.0)
    ap.add_argument("--depth_trunc", type=float, default=-1.0)
    ap.add_argument("--sdf_trunc", type=float, default=-1.0)
    ap.add_argument("--num_cluster", type=int, default=50)
    ap.add_argument("--mesh_res", type=int, default=1024)
    ap.add_argument("--unbounded", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from gs2d_tpu.config import load_cfg_args
    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    model, pipe, opt = load_cfg_args(cfg_path)
    if args.source_path:
        model.source_path = args.source_path
    model.model_path = args.model_path

    from gs2d_tpu.render.extract import (GaussianExtractor, post_process_mesh,
                                         save_mesh)
    from gs2d_tpu.scene.scene import Scene

    scene = Scene(model, load_iteration=args.iteration, shuffle=False)
    iteration = scene.loaded_iter
    print(f"rendering model at iteration {iteration}")

    bg = (1.0, 1.0, 1.0) if model.white_background else (0.0, 0.0, 0.0)
    extractor = GaussianExtractor(
        scene.gaussians, max_sh_degree=model.sh_degree,
        depth_ratio=pipe.depth_ratio, bg_color=bg,
        interpret=args.interpret)

    train_dir = os.path.join(args.model_path, "train",
                             f"ours_{iteration}")
    test_dir = os.path.join(args.model_path, "test", f"ours_{iteration}")

    if not args.skip_train:
        extractor.reconstruction(scene.get_train_cameras())
        extractor.export_image(train_dir)
    if not args.skip_test and scene.get_test_cameras():
        extractor.reconstruction(scene.get_test_cameras())
        extractor.export_image(test_dir)
    if args.render_path:
        from gs2d_tpu.scene.cameras import CameraData
        from gs2d_tpu.utils.render_paths import create_video, generate_path
        cams = generate_path(scene.get_train_cameras(), n_frames=240)
        extractor.reconstruction([CameraData(camera=c) for c in cams])
        frames = [r.transpose(1, 2, 0) for r in extractor.rgbmaps]
        traj_dir = os.path.join(args.model_path, "traj",
                                f"ours_{iteration}")
        os.makedirs(traj_dir, exist_ok=True)
        create_video(frames, os.path.join(traj_dir, "render_traj.mp4"))

    if not args.skip_mesh:
        import dataclasses

        import jax.numpy as jnp
        # meshing uses diffuse color only (render.py:93)
        gs = scene.gaussians
        gs0 = dataclasses.replace(gs, active_sh_degree=jnp.int32(0))
        extractor.state = gs0
        extractor.reconstruction(scene.get_train_cameras())
        os.makedirs(train_dir, exist_ok=True)
        if args.unbounded:
            name = "fuse_unbounded.ply"
            verts, faces, colors = extractor.extract_mesh_unbounded(
                resolution=args.mesh_res)  # block-wise; 1024 like reference
        else:
            name = "fuse.ply"
            _, radius = extractor.estimate_bounding_sphere()
            depth_trunc = (radius * 2.0) if args.depth_trunc < 0 else \
                args.depth_trunc
            voxel_size = (depth_trunc / args.mesh_res) if \
                args.voxel_size < 0 else args.voxel_size
            sdf_trunc = 5.0 * voxel_size if args.sdf_trunc < 0 else \
                args.sdf_trunc
            verts, faces, colors = extractor.extract_mesh_bounded(
                voxel_size=voxel_size, sdf_trunc=sdf_trunc,
                depth_trunc=depth_trunc)
        save_mesh(os.path.join(train_dir, name), verts, faces, colors)
        print(f"mesh saved at {os.path.join(train_dir, name)}: "
              f"{len(verts)} verts {len(faces)} faces")
        v2, f2, c2 = post_process_mesh(verts, faces, colors,
                                       num_cluster=args.num_cluster)
        save_mesh(os.path.join(train_dir,
                               name.replace(".ply", "_post.ply")), v2, f2,
                  c2)
        print(f"post-processed mesh: {len(v2)} verts {len(f2)} faces")


if __name__ == "__main__":
    main()
