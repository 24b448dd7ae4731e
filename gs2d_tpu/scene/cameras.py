"""Camera model.

Mirrors the reference Camera contract (/root/reference/scene/cameras.py:17-73):
row-vector ``world_view`` / ``full_proj`` matrices, camera center from the
inverse view transform, znear=0.01 / zfar=100. Designed as a JAX pytree whose
SHAPE-determining fields (width/height) are static aux data, so a jitted
render specializes per resolution; fovs are dynamic leaves — they are pure
metadata to traced code (the matrices already encode them) and making them
static would recompile the train step per distinct focal (multi-camera rigs
or per-image undistortion produce hundreds of slightly different fovs).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    # dynamic leaves (fovs included: host-only metadata, see module doc)
    world_view: Any  # (4,4) row-vector world→view (transposed classic matrix)
    full_proj: Any   # (4,4) row-vector world→clip
    campos: Any      # (3,) camera center in world space
    fovx: float
    fovy: float
    # static aux
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # dynamic with defaults (host metadata too — the viewer feeds
    # arbitrary znear/zfar per message; static would recompile each)
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                znear: float = 0.01, zfar: float = 100.0,
                translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-style R (cam→world rotation) and t
    (world→cam translation), as the reference does in scene/cameras.py:57-60."""
    from ..ops.transforms import projection_matrix, world_to_view

    w2v = world_to_view(R, t, translate, scale)       # column-vector form
    proj = projection_matrix(znear, zfar, fovx, fovy)  # column-vector form
    world_view = w2v.T.astype(np.float32)              # row-vector form
    full_proj = (proj @ w2v).T.astype(np.float32)      # row-vector form
    campos = np.linalg.inv(w2v)[:3, 3].astype(np.float32)
    return Camera(
        world_view=world_view, full_proj=full_proj, campos=campos,
        width=int(width), height=int(height), fovx=float(fovx), fovy=float(fovy),
        znear=znear, zfar=zfar,
    )


@dataclasses.dataclass
class CameraData:
    """Host-side camera + image bundle used by the training loop (the analog
    of the reference Camera's image fields, kept out of the jit pytree)."""
    camera: Camera
    image: Optional[np.ndarray] = None        # (3,H,W) float32 in [0,1]
    alpha_mask: Optional[np.ndarray] = None   # (1,H,W) or None
    image_name: str = ""
    uid: int = 0
    # world→cam raw params retained for mesh/eval export
    R: Optional[np.ndarray] = None
    T: Optional[np.ndarray] = None
    edited_image: Optional[np.ndarray] = None  # IG2G fork slot (cameras.py:40)
