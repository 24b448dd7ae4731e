"""End-to-end gate for the full training LOOP (gs2d_tpu/train/loop.py).

Drives `train()` itself — not just make_train_step — through the
reference schedule semantics (/root/reference/train.py:54-168) compressed
to CPU scale: densify cadence, opacity reset, capacity-bucket growth,
and pairs-capacity overflow escalation must all fire in one run, and the
loop must keep optimizing through every recompile. This is the
small-scale twin of the 30k-iteration at-scale run (RUNLOG_scale.md).
"""

import jax.numpy as jnp
import numpy as np

import gs2d_tpu.train.loop as loop_mod
from gs2d_tpu.config import (ModelParams, OptimizationParams,
                             PipelineParams, RuntimeParams)
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.render.renderer import render

from .utils import lookat_camera, random_cloud


class _StubScene:
    """Scene stand-in: in-memory cameras + model, no dataset IO (the
    readers have their own tests; this isolates the loop logic)."""

    instance = None

    def __init__(self, args, *, capacity, seed=0, **_):
        W, H = 64, 32
        means, scales, quats, opac, rgb, _ = random_cloud(
            40, 3, spread=0.9, scale_lo=0.08, scale_hi=0.35)
        gt_state = init_from_pcd(means, rgb, 64,
                                 init_scales=np.log(scales), seed=0)
        rcfg = RasterizeConfig(width=W, height=H, pairs_capacity=1 << 12,
                               chunk=16, interpret=True)
        bg = jnp.zeros((3,), jnp.float32)
        cams = []
        for i, dist in enumerate((4.0, 3.4, 4.7)):
            cam = lookat_camera(width=W, height=H, dist=dist)
            img = np.asarray(render(cam, gt_state, rcfg, bg)["render"])
            cams.append(_cam_data(cam, img, i))
        self._cams = cams
        self.model_path = ""
        self.cameras_extent = 1.5
        # learner init: sparse, displaced, flat-gray — far from converged
        rng = np.random.default_rng(11)
        init_pts = (means[:12]
                    + rng.normal(scale=0.15, size=(12, 3)).astype(np.float32))
        self.gaussians = init_from_pcd(
            init_pts, np.full((12, 3), 0.5, np.float32), capacity,
            max_sh_degree=args.sh_degree, seed=seed)
        self.init_gaussians = self.gaussians
        self.saved = []
        _StubScene.instance = self

    def get_train_cameras(self, scale=1.0):
        return self._cams

    def get_test_cameras(self, scale=1.0):
        return []

    def save(self, iteration, state):
        self.saved.append(iteration)


def _cam_data(cam, img, uid):
    from gs2d_tpu.scene.cameras import CameraData
    return CameraData(camera=cam, image=img, image_name=f"v{uid}", uid=uid)


def test_loop_schedule_end_to_end(monkeypatch):
    monkeypatch.setattr(loop_mod, "Scene", _StubScene)

    model = ModelParams(sh_degree=2, source_path="unused", model_path="")
    opt = OptimizationParams(
        iterations=300,
        densify_from_iter=20, densify_until_iter=220,
        densification_interval=20, opacity_reset_interval=120,
        densify_grad_threshold=5e-5, percent_dense=0.01,
        position_lr_init=2e-3, position_lr_final=2e-4)
    pipe = PipelineParams()
    # initial_capacity barely above the 12-point init and a deliberately
    # starved pairs capacity: growth and overflow escalation MUST trigger
    rt = RuntimeParams(initial_capacity=16, capacity_headroom=1.25,
                       pairs_capacity=128, chunk=16, interpret=True,
                       pairs_capacity_auto=False, seed=0)

    events = []
    losses = []

    def log_fn(iteration, info):
        if "event" in info:
            events.append((iteration, info["event"]))
        else:
            losses.append((iteration, info["loss"], info["points"]))

    ts, scene = loop_mod.train(model, opt, pipe, rt,
                               test_iterations=[], save_iterations=[],
                               log_fn=log_fn)

    ev_text = " | ".join(e for _, e in events)
    assert "capacity" in ev_text and "→" in ev_text, \
        f"no capacity growth events fired: {ev_text!r}"
    assert any(e.startswith("pairs_capacity →") for _, e in events), \
        f"pairs overflow escalation never fired: {ev_text!r}"
    n_final = int(ts.gaussians.num_active())
    assert n_final > 12, f"densification never grew the model ({n_final})"
    # the loop must keep optimizing through every recompile: no NaN/Inf
    # ticks, and the loss floor must sit well under the peak (the logged
    # value is an EMA warming up from 0, so the first tick is not a
    # meaningful anchor; resets spike the peak, training digs the floor)
    lvals = np.array([l for _, l, _ in losses])
    assert np.isfinite(lvals).all(), "loss diverged to NaN/Inf mid-run"
    assert lvals.min() < 0.8 * lvals.max(), \
        f"no loss progress at any point: floor {lvals.min():.4f}, " \
        f"peak {lvals.max():.4f}"
    # quality gate robust to the opacity-reset sawtooth: the final state
    # must render the first training view strictly better than the init
    scene2 = _StubScene.instance
    cam0 = scene2.get_train_cameras()[0]
    rcfg = RasterizeConfig(width=cam0.camera.width,
                           height=cam0.camera.height,
                           pairs_capacity=1 << 12, chunk=16, interpret=True)
    bg = jnp.zeros((3,), jnp.float32)

    def psnr_of(state):
        img = np.asarray(render(cam0.camera, state, rcfg, bg,
                                max_sh_degree=model.sh_degree)["render"])
        mse = float(np.mean((img - cam0.image) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    p_final = psnr_of(ts.gaussians)
    p_init = psnr_of(scene2.init_gaussians)
    assert p_final > p_init + 2.0, \
        f"no quality gain through the schedule: {p_init:.2f} -> {p_final:.2f} dB"
