"""Op-level breakdown of bin_gaussians via jax.profiler + the
tensorboard profile plugin's xplane converter. Finds where the measured
~509 ms at 1M splats/1080p actually goes (individual primitive costs sum
to ~100 ms — something structural hides the rest).
"""

import glob
import gzip
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import suggest_capacities
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene

W, H = 1920, 1080
N = int(os.environ.get("DIAG_N", "1000000"))
CHUNK = 128
TRACE_DIR = "/tmp/bin_trace"


def main():
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(N))
    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H,
        colors=c))(means, scales, quats, opac, rgb)
    cap, fin_cap, rows_cap = suggest_capacities(pre, W, H, chunk=CHUNK)
    print(f"cap {cap} fin {fin_cap}", flush=True)
    bin_fn = jax.jit(lambda c2: bin_gaussians(
        c2, pre.extent, pre.depth, pre.visible, W, H, cap, CHUNK,
        cull_abc=(pre.A, pre.B, pre.C), rho2max=pre.rho2max,
        final_capacity=fin_cap, rows_capacity=rows_cap))

    def step(c2):
        b = bin_fn(c2)
        fb = (jnp.sum(b.gid[::997]) + jnp.sum(b.inv[::1009]) +
              jnp.sum(b.tile_start) + jnp.sum(b.seg_start[::499]))
        return c2 + 1e-30 * fb.astype(jnp.float32)

    c2 = pre.center2d
    for _ in range(2):
        c2 = step(c2)
    np.asarray(jax.device_get(c2[0]))

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            c2 = step(c2)
        np.asarray(jax.device_get(c2[0]))

    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    print("xplanes:", paths, flush=True)
    if not paths:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [paths[-1]], "framework_op_stats^", {})
        out = "/tmp/bin_trace_opstats.json"
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
            data = data.decode("utf-8", "replace")
        with open(out, "w") as f:
            f.write(data)
        print("wrote", out, flush=True)
    except Exception as e:
        print("framework_op_stats failed:", e, flush=True)
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [paths[-1]], "op_profile^", {})
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open("/tmp/bin_trace_opprofile.json", "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print("wrote /tmp/bin_trace_opprofile.json", flush=True)
        except Exception as e2:
            print("op_profile failed too:", e2, flush=True)


if __name__ == "__main__":
    main()
