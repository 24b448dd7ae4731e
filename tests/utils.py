"""Shared test helpers: tiny synthetic scenes."""

import math

import numpy as np

from gs2d_tpu.scene.cameras import make_camera


def lookat_camera(width=128, height=64, fov=60.0, dist=4.0):
    """Camera at -z looking at the origin (world +z forward)."""
    R = np.eye(3)  # cam→world rotation
    t = np.array([0.0, 0.0, dist])  # world→cam translation: origin at z=dist
    fovx = math.radians(fov)
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    return make_camera(R, t, fovx, fovy, width, height)


def random_cloud(n=200, seed=0, spread=1.0, scale_lo=0.02, scale_hi=0.25):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(scale_lo, scale_hi, (n, 2)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    noise = rng.normal(size=(n, 3)).astype(np.float32)
    return means, scales, quats, opac, rgb, noise
