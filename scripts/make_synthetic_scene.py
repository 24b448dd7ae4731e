"""Generate a synthetic multi-view dataset in Blender/NeRF-synthetic layout.

Ground truth is a structured surfel cloud (a colored torus of oriented
disks); views are rendered with the framework's own oracle rasterizer and
written as PNGs + transforms_train/test.json, so `python train.py -s
<dir>` exercises the full real-data pipeline end-to-end without any
external dataset (zero-egress environment).
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_torus_surfels(n=4000, R=0.8, r=0.3, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    cx = np.cos(theta) * (R + r * np.cos(phi))
    cy = np.sin(theta) * (R + r * np.cos(phi))
    cz = r * np.sin(phi)
    pts = np.stack([cx, cy, cz], -1).astype(np.float32)
    # surface normal
    center_ring = np.stack([R * np.cos(theta), R * np.sin(theta),
                            0 * theta], -1)
    nrm = (pts - center_ring) / r
    # quaternion aligning disk normal (local z) to nrm
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(np.tile(z, (n, 1)), nrm)
    w = 1.0 + nrm @ z
    quat = np.concatenate([w[:, None], v], -1)
    quat /= np.maximum(np.linalg.norm(quat, axis=-1, keepdims=True), 1e-8)
    # coherent color from angle
    rgb = np.stack([0.5 + 0.5 * np.cos(theta),
                    0.5 + 0.5 * np.sin(2 * phi),
                    0.5 + 0.5 * np.sin(theta + phi)], -1).astype(np.float32)
    scales = np.full((n, 2), 0.035, np.float32)
    opac = np.full((n,), 0.85, np.float32)
    return pts, scales, quat.astype(np.float32), opac, rgb


def make_rich_surfels(n=300_000, seed=0):
    """Trained-scene-like geometry (torus + ground disc + background
    shell, gs2d_tpu/utils/bench_scenes.py) with PROCEDURAL multi-scale
    colors: coarse bands plus fine stripes that a sparse random init
    cannot represent — the fine detail drives densification toward the
    reference regime (clone/split to 10^5-10^6 splats,
    /root/reference/scene/gaussian_model.py:348-403) in the 30k-iteration
    at-scale run (VERDICT r1 item 2)."""
    from gs2d_tpu.utils.bench_scenes import make_trained_like_scene

    pts, scales, quat, opac, _ = make_trained_like_scene(
        n, seed=seed, overlap=2.0)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    # three spatial frequencies: 2, 9, and 31 cycles across the scene
    rgb = np.stack([
        0.55 + 0.25 * np.sin(2.0 * x) * np.cos(2.0 * y)
        + 0.20 * np.sin(9.0 * (x + z)),
        0.50 + 0.30 * np.cos(2.0 * z + 9.0 * y)
        + 0.15 * np.sin(31.0 * x),
        0.45 + 0.25 * np.sin(9.0 * (y - z))
        + 0.20 * np.cos(31.0 * (x + y)),
    ], -1).astype(np.float32)
    return pts, scales, quat, np.clip(opac, 0.3, 0.995), np.clip(rgb, 0, 1)


def orbit_c2w(theta, elev=0.5, dist=3.2):
    """OpenGL-convention camera on an orbit looking at the origin."""
    eye = np.array([dist * math.cos(theta) * math.cos(elev),
                    dist * math.sin(theta) * math.cos(elev),
                    dist * math.sin(elev)])
    fwd = -eye / np.linalg.norm(eye)
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up0)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -fwd          # OpenGL: camera looks along -z
    c2w[:3, 3] = eye
    return c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_torus")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=40)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--n_surfels", type=int, default=4000)
    ap.add_argument("--white_background", action="store_true")
    ap.add_argument("--preset", choices=["torus", "rich"], default="torus",
                    help="rich = trained-like geometry + multi-scale "
                         "procedural texture (for the at-scale run); "
                         "supports --width/--height")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, rasterize,
                                            suggest_capacities)
    from gs2d_tpu.ops.rasterize.preprocess import preprocess
    from gs2d_tpu.scene.cameras import make_camera

    W = args.width or args.size
    H = args.height or args.size
    if args.preset == "rich":
        fovx = math.radians(70.0)
        pts, scales, quat, opac, rgb = make_rich_surfels(args.n_surfels)
    else:
        fovx = math.radians(50.0)
        pts, scales, quat, opac, rgb = make_torus_surfels(args.n_surfels)
    on_cpu = os.environ.get("JAX_PLATFORMS") == "cpu"
    bgv = 1.0 if args.white_background else 0.0

    gt = tuple(jnp.asarray(a) for a in (pts, scales, quat, opac, rgb))
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)

    def cam_of(c2w):
        c2w_cv = c2w.copy()
        c2w_cv[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w_cv)
        return make_camera(w2c[:3, :3].T, w2c[:3, 3], fovx, fovy, W, H)

    # jit once over (world_view, full_proj, campos) — EAGER dispatch through
    # the axon tunnel costs ~166 s/frame. Probe the pair demand over the
    # orbit's elevation RANGE (0.05–0.65: a top-down view of the ground
    # disc projects far more pairs than a near-edge-on one) and size one
    # capacity for all views from the max.
    pre0 = jax.jit(lambda a, wv, fp, cp: preprocess(
        a[0], a[1], a[2], a[3], wv, fp, cp, W, H, colors=a[4]))
    chunk = 128 if not on_cpu else 16
    cap = fin_cap = 0
    for elev in (0.05, 0.35, 0.65):
        pc = cam_of(orbit_c2w(0.0, elev))
        c, f, _r = suggest_capacities(
            pre0(gt, pc.world_view, pc.full_proj, pc.campos), W, H,
            chunk=chunk, slack=1.8)
        cap, fin_cap = max(cap, c), max(fin_cap, f)
    cfg = RasterizeConfig(
        width=W, height=H, pairs_capacity=cap, final_capacity=fin_cap,
        chunk=chunk, interpret=on_cpu)

    @functools.partial(jax.jit, donate_argnums=())
    def _render(a, wv, fp, cp):
        pre = preprocess(a[0], a[1], a[2], a[3], wv, fp, cp, W, H,
                         colors=a[4])
        out, aux = rasterize(pre, cfg)
        alpha = jnp.clip(out[4], 0, 1)
        img = jnp.clip(out[0:3] + (1 - alpha) * bgv, 0, 1)
        return jnp.concatenate([img, alpha[None]], 0), aux["overflow"]

    def render_view(c2w):
        cam = cam_of(c2w)
        rgba, overflow = jax.device_get(_render(
            gt, cam.world_view, cam.full_proj, cam.campos))
        assert not bool(overflow)
        return (np.asarray(rgba).transpose(1, 2, 0) * 255).astype(np.uint8)

    os.makedirs(args.out, exist_ok=True)
    if args.preset == "rich":
        # COLMAP-like sparse seed covering the WHOLE scene (incl. the
        # radius-6 background shell, far outside the Blender reader's
        # default [-1.3, 1.3]³ random init): subsample GT positions with
        # noise, as a real SfM cloud would land on textured surfaces.
        from gs2d_tpu.scene.ply import write_point_cloud
        rng = np.random.default_rng(7)
        n_seed = min(30_000, len(pts))
        sel = rng.choice(len(pts), n_seed, replace=False)
        seed_xyz = (pts[sel]
                    + rng.normal(scale=0.01, size=(n_seed, 3))
                    .astype(np.float32))
        write_point_cloud(os.path.join(args.out, "points3d.ply"),
                          seed_xyz.astype(np.float32),
                          np.clip(rgb[sel] + rng.normal(
                              scale=0.05, size=(n_seed, 3)), 0, 1)
                          .astype(np.float32))
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i in range(n):
            theta = 2 * np.pi * (i + (0.5 if split == "test" else 0)) / n
            elev = 0.35 + 0.3 * math.sin(3.1 * theta)
            c2w = orbit_c2w(theta, elev)
            img = render_view(c2w)
            Image.fromarray(img, "RGBA").save(
                os.path.join(args.out, split, f"r_{i}.png"))
            frames.append({"file_path": f"{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(args.out,
                               f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
