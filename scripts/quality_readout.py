"""Quality readout of the completed 30k at-scale run (VERDICT r2 item 4).

Renders the test split from the trained model, computes PSNR/SSIM vs the
synthetic GT images, extracts the TSDF mesh, and scores bidirectional
chamfer distance of the mesh against analytic GT surface samples (the
rich scene's geometry is make_trained_like_scene's torus + ground disc +
background shell — GT surfel centers lie exactly on those surfaces).

Writes one JSON artifact to QUALITY_scale.json at the repo root.

Usage: python scripts/quality_readout.py [--model /tmp/rich_run]
       [--data /tmp/rich_1080p] [--iteration 30000]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def gt_surface_points(n=200_000, seed=7):
    """Analytic samples of the rich scene's GT surfaces (matches
    gs2d_tpu/utils/bench_scenes.py make_trained_like_scene geometry)."""
    from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
    pts, _, _, _, _ = make_trained_like_scene(n, seed=seed, overlap=2.0)
    return np.asarray(pts, np.float32)


def chamfer(a, b, block=8192):
    """Mean bidirectional nearest-neighbor distance.

    KD-tree when scipy is present (~seconds at 100k x 100k); numpy
    blockwise fallback otherwise (minutes at that size).
    """
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        def one_way(x, y):
            mins = np.empty(len(x), np.float32)
            for i in range(0, len(x), block):
                d = ((x[i:i + block, None, :] - y[None, :, :]) ** 2).sum(-1)
                mins[i:i + block] = d.min(1)
            return np.sqrt(mins).mean()
    else:
        def one_way(x, y):
            return float(cKDTree(y).query(x, workers=-1)[0].mean())
    return float(one_way(a, b)), float(one_way(b, a))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/rich_run")
    ap.add_argument("--data", default="/tmp/rich_1080p")
    ap.add_argument("--iteration", type=int, default=30000)
    ap.add_argument("--skip_render", action="store_true")
    ap.add_argument("--mesh_gt_samples", type=int, default=100_000)
    ap.add_argument("--interpret", action="store_true",
                    help="pass --interpret to render.py (CPU dry-runs "
                         "of the pipeline)")
    ap.add_argument("--mesh_res", type=int, default=1024)
    args = ap.parse_args()

    rec = {"ts": time.time(), "model": args.model, "iteration": args.iteration}
    out = os.path.join(ROOT, "QUALITY_scale.json")

    def flush_rec():
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)

    def render_cmd(extra):
        cmd = [sys.executable, os.path.join(ROOT, "render.py"),
               "-m", args.model, "-s", args.data,
               "--iteration", str(args.iteration), "--skip_train"] + extra
        if args.interpret:
            cmd += ["--interpret"]
        return cmd

    # Stage 1 (cheap, near-certain): test-split renders -> NVS metrics.
    # Kept independent of the mesh stage so a TSDF failure cannot cost
    # the PSNR/SSIM half of the artifact.
    if not args.skip_render:
        print("=== render test split ===", flush=True)
        subprocess.run(render_cmd(["--skip_mesh"]), check=True, cwd=ROOT)

    print("=== metrics ===", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "metrics.py"),
         "-m", args.model], check=True, cwd=ROOT)
    with open(os.path.join(args.model, "results.json")) as f:
        res = json.load(f)
    rec["nvs"] = res
    flush_rec()

    # Stage 2: TSDF mesh extraction at the requested resolution, with a
    # half-resolution retry — unproven-at-scale voxel grids must not be
    # able to void the artifact.
    if not args.skip_render:
        for res_try, budget_s in ((args.mesh_res, 2100),
                                  (args.mesh_res // 2, 900)):
            print(f"=== mesh extraction @ {res_try} ===", flush=True)
            try:
                subprocess.run(
                    render_cmd(["--skip_test", "--mesh_res", str(res_try)]),
                    check=True, cwd=ROOT, timeout=budget_s)
                rec["mesh_res"] = res_try
                flush_rec()
                break
            except (subprocess.CalledProcessError,
                    subprocess.TimeoutExpired) as e:
                print(f"mesh @ {res_try} failed: {e!r}", flush=True)
                rec["mesh_error"] = f"{res_try}: {type(e).__name__}"
                flush_rec()

    # mesh chamfer vs analytic GT
    mesh_path = None
    for cand in ("fuse_post.ply", "fuse.ply"):
        p = os.path.join(args.model, "train", f"ours_{args.iteration}", cand)
        if os.path.exists(p):
            mesh_path = p
            break
        p2 = os.path.join(args.model, cand)
        if os.path.exists(p2):
            mesh_path = p2
            break
    if mesh_path is None:
        # search anywhere under the model dir
        for dirpath, _, files in os.walk(args.model):
            for fn in files:
                if fn.startswith("fuse") and fn.endswith(".ply"):
                    mesh_path = os.path.join(dirpath, fn)
                    break
            if mesh_path:
                break
    rec["mesh_path"] = mesh_path
    if mesh_path:
        from gs2d_tpu.eval.geometry import sample_mesh_points
        from gs2d_tpu.scene.ply import read_mesh_ply
        verts, faces = read_mesh_ply(mesh_path)[:2]
        rec["mesh_verts"] = int(len(verts))
        rec["mesh_faces"] = int(len(faces))
        ms = sample_mesh_points(verts, faces, args.mesh_gt_samples, seed=0)
        gt = gt_surface_points(args.mesh_gt_samples)
        # crop both to the foreground region (torus + disc live inside
        # r < 1.6; the background shell is at r ~ 4 — meshing truncates
        # it differently per TSDF params, so score foreground geometry)
        ms_f = ms[np.linalg.norm(ms, axis=1) < 1.6]
        gt_f = gt[np.linalg.norm(gt, axis=1) < 1.6]
        d2s, s2d = chamfer(ms_f, gt_f)
        rec["chamfer_mesh_to_gt"] = d2s
        rec["chamfer_gt_to_mesh"] = s2d
        rec["chamfer_mean"] = 0.5 * (d2s + s2d)
        rec["fg_mesh_samples"] = int(len(ms_f))
        rec["fg_gt_samples"] = int(len(gt_f))

    flush_rec()
    print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
