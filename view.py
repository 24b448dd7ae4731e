#!/usr/bin/env python
"""Live viewer server: serve a trained model to the SIBR remote viewer.

Surface of /root/reference/view.py:9-51 — load a model iteration and loop
try_connect → receive → render → send forever.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--ip", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=6009)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gs2d_tpu.config import load_cfg_args
    from gs2d_tpu.ops.rasterize.api import RasterizeConfig
    from gs2d_tpu.render.network_gui import NetworkGUI, render_net_image
    from gs2d_tpu.render.renderer import render
    from gs2d_tpu.scene.scene import Scene

    model, pipe, _ = load_cfg_args(
        os.path.join(args.model_path, "cfg_args.json"))
    model.model_path = args.model_path
    scene = Scene(model, load_iteration=args.iteration, shuffle=False)
    state = scene.gaussians
    bg = jnp.asarray([1.0] * 3 if model.white_background else [0.0] * 3,
                     jnp.float32)

    gui = NetworkGUI()
    gui.init(args.ip, args.port)
    print(f"viewer server on {args.ip}:{args.port}")
    render_items = list(model.render_items)

    # The render MUST be jitted: dispatching it eagerly sends every op
    # through the runtime individually (measured 166 s/frame on a
    # tunneled TPU vs ~10 ms jitted). One compile per resolution,
    # cached — scaling_modifier stays a traced scalar.
    import functools

    import jax

    @functools.lru_cache(maxsize=8)
    def render_fn(width, height):
        cfg = RasterizeConfig(width=width, height=height)
        return jax.jit(lambda cam, st, bg, scaling: render(
            cam, st, cfg, bg, max_sh_degree=model.sh_degree,
            scaling_modifier=scaling, depth_ratio=pipe.depth_ratio))

    num_active = int(state.num_active())
    import time
    while True:
        if gui.conn is None:
            gui.try_connect(render_items)
            if gui.conn is None:
                time.sleep(0.05)   # non-blocking accept: don't busy-spin
            continue
        try:
            cam, _, keep_alive, scaling, mode = gui.receive()
            img_bytes = None
            if cam is not None:
                pkg = render_fn(cam.width, cam.height)(
                    cam, state, bg, jnp.float32(scaling))
                net = render_net_image(pkg, render_items, mode, cam)
                img = (np.clip(net, 0, 1) * 255).astype(np.uint8)
                img_bytes = memoryview(
                    np.ascontiguousarray(img.transpose(1, 2, 0)))
            gui.send(img_bytes, model.source_path,
                     {"#": num_active, "loss": 0.0})
        except Exception as e:                     # noqa: BLE001
            print(f"viewer connection dropped: {type(e).__name__}: {e}")
            gui.disconnect()


if __name__ == "__main__":
    main()
