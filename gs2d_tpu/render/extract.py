"""Mesh extraction: render all views, TSDF-fuse, marching tetrahedra.

Capability of the reference GaussianExtractor
(/root/reference/utils/mesh_utils.py:73-312): per-view RGB + surf-depth
rendering, camera-orbit bounding-sphere estimation, bounded TSDF fusion
(Open3D replaced by ops/tsdf.py on device + ops/marching.py), unbounded
extraction with MipNeRF-360 contraction and adaptive truncation, image
export, and largest-cluster post-processing.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianState
from ..ops.marching import largest_clusters, marching_tets
from ..ops.rasterize.api import RasterizeConfig
from ..ops.transforms import fov2focal
from ..ops.tsdf import TSDFVolume, integrate, make_volume
from ..scene.cameras import CameraData
from ..scene.ply import write_mesh_ply
from .renderer import render


class GaussianExtractor:
    def __init__(self, state: GaussianState, *, max_sh_degree: int = 3,
                 pairs_capacity: int = 1 << 21, chunk: int = 128,
                 interpret: bool = False, depth_ratio: float = 0.0,
                 bg_color=(0.0, 0.0, 0.0)):
        self.state = state
        self.max_sh_degree = max_sh_degree
        self.pairs_capacity = pairs_capacity
        self.chunk = chunk
        self.interpret = interpret
        self.depth_ratio = depth_ratio
        self.bg = jnp.asarray(bg_color, jnp.float32)
        self._render_cache = {}   # (W, H) → jitted renderer, survives clean
        self.clean()

    def clean(self):
        self.rgbmaps: List[np.ndarray] = []
        self.depthmaps: List[np.ndarray] = []
        self.alphamaps: List[np.ndarray] = []
        self.normalmaps: List[np.ndarray] = []
        self.viewpoints: List[CameraData] = []

    def _render_fn(self, width: int, height: int):
        """Jitted per-resolution renderer — eager dispatch sends every op
        through the runtime individually (minutes/view on remote
        backends); jitted it is one launch per view."""
        key = (width, height)
        fn = self._render_cache.get(key)
        if fn is None:
            cfg = RasterizeConfig(
                width=width, height=height,
                pairs_capacity=self.pairs_capacity, chunk=self.chunk,
                interpret=self.interpret)
            fn = jax.jit(lambda cam, st, bg: render(
                cam, st, cfg, bg, max_sh_degree=self.max_sh_degree,
                depth_ratio=self.depth_ratio))
            self._render_cache[key] = fn
        return fn

    def reconstruction(self, viewpoints: List[CameraData]):
        """Render every view and stash rgb / surf-depth / alpha / normal
        (reference :104-137)."""
        from ..ops.rasterize.binning import MAX_PAIRS_CAPACITY
        self.clean()
        self.viewpoints = list(viewpoints)
        for cam_data in viewpoints:
            cam = cam_data.camera
            # a truncated render (binning pair overflow) would silently
            # corrupt the fused mesh — grow capacity and re-render, like
            # the training loop's overflow escalation (train/loop.py)
            while True:
                pkg = self._render_fn(cam.width, cam.height)(
                    cam, self.state, self.bg)
                if not bool(pkg["overflow"]):
                    break
                if self.pairs_capacity >= MAX_PAIRS_CAPACITY:
                    print("[reconstruction] WARNING: pair demand exceeds "
                          "the bookkeeping ceiling; render is truncated")
                    break
                self.pairs_capacity = min(self.pairs_capacity * 2,
                                          MAX_PAIRS_CAPACITY)
                self._render_cache.clear()
                print(f"[reconstruction] pairs overflow — regrowing "
                      f"capacity to {self.pairs_capacity}")
            self.rgbmaps.append(np.asarray(jnp.clip(pkg["render"], 0, 1)))
            self.depthmaps.append(np.asarray(pkg["surf_depth"]))
            self.alphamaps.append(np.asarray(pkg["rend_alpha"]))
            self.normalmaps.append(np.asarray(pkg["rend_normal"]))
        # refresh the bounding sphere for THESE cameras (reference :137
        # recomputes it every reconstruction; a stale sphere from a prior
        # call would misplace the TSDF volume / contraction)
        self.estimate_bounding_sphere()

    def estimate_bounding_sphere(self):
        """Focus point + min camera distance (reference :139-151)."""
        from ..utils.render_paths import focus_point_fn
        c2ws = np.array([np.linalg.inv(np.asarray(
            cd.camera.world_view.T)) for cd in self.viewpoints])
        poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
        center = focus_point_fn(poses)
        self.radius = float(np.linalg.norm(c2ws[:, :3, 3] - center,
                                           axis=-1).min())
        self.center = center
        return self.center, self.radius

    def extract_mesh_bounded(self, voxel_size=0.004, sdf_trunc=0.02,
                             depth_trunc=3.0, max_dim=640,
                             mask_background=True):
        """Bounded TSDF fusion (reference :154-195). The dense grid is
        capped at max_dim^3 (640^3 x 5 f32 channels ≈ 5 GB on a 16 GB
        chip) — Open3D's scalable volume is sparse and honors any voxel
        size, so when the cap coarsens the protocol voxel we say so
        LOUDLY: eval scores at a different resolution than requested are
        not comparable."""
        if not hasattr(self, "radius"):
            self.estimate_bounding_sphere()
        vol = make_volume(self.center, depth_trunc / 2.0 + self.radius,
                          voxel_size, max_dim=max_dim)
        if vol.voxel_size > float(voxel_size) * 1.01:
            print(f"[extract_mesh_bounded] WARNING: requested voxel "
                  f"{voxel_size} needs dim > {max_dim}; coarsened to "
                  f"{vol.voxel_size:.5f} — scores are NOT protocol-"
                  f"comparable (raise max_dim if HBM allows)")
        # if the dense grid was coarsened to fit max_dim, the truncation
        # band must stay a few voxels wide or marching finds no crossings
        sdf_trunc = max(float(sdf_trunc), 2.5 * vol.voxel_size)
        for i, cd in enumerate(self.viewpoints):
            cam = cd.camera
            depth = self.depthmaps[i].reshape(cam.height, cam.width)
            # the reference masks depth ONLY with the dataset's GT alpha
            # mask when one exists (mesh_utils.py:181-182); rendered-alpha
            # masking would erode silhouette rims the reference fuses.
            # Empty-background pixels carry depth≈0 and are dropped by
            # integrate()'s validity gate, exactly like Open3D's.
            if mask_background and cd.alpha_mask is not None:
                m = np.asarray(cd.alpha_mask).reshape(cam.height, cam.width)
                depth = np.where(m > 0.5, depth, 0.0)
            vol = integrate(
                vol, jnp.asarray(depth), jnp.asarray(self.rgbmaps[i]),
                cam.world_view,
                fov2focal(cam.fovx, cam.width),
                fov2focal(cam.fovy, cam.height),
                cam.width, cam.height,
                float(sdf_trunc), float(depth_trunc))
        self.volume = vol
        verts, faces = marching_tets(
            np.asarray(vol.tsdf), np.asarray(vol.origin), vol.voxel_size,
            mask=np.asarray(vol.weight) > 0)
        colors = self._sample_colors(vol, verts)
        return verts, faces, colors

    def extract_mesh_unbounded(self, resolution=512, block_size=256,
                               max_range=32.0):
        """Unbounded meshing with MipNeRF-360 contraction
        (reference :198-293): evaluate a contracted-space SDF grid by
        projective fusion over all views with adaptive truncation, then
        run marching tets in contracted space and un-contract vertices.

        BLOCK-WISE, like the reference's marching_cubes_with_contraction
        (utils/mcube_utils.py:17-95, 512³ crops up to res 1024): the grid
        is processed in ``block_size``³ chunks with one-point overlap, so
        peak memory is bounded by the block, not the resolution, and each
        block is ONE device program (all views fused via lax.scan —
        tsdf.fuse_sdf_points_views). Block meshes are merged by exact
        lattice-quantized vertex dedup, so shared-face vertices weld and
        the result is identical to a monolithic extraction."""
        if not hasattr(self, "radius"):
            self.estimate_bounding_sphere()

        def uncontract(y):
            n = np.linalg.norm(y, axis=-1, keepdims=True)
            return np.where(n <= 1, y, 1 / (2 - np.maximum(n, 1e-9)) * y / n)

        # normalize world → unit sphere around the scene center
        scale = 1.0 / self.radius

        from ..ops.tsdf import fuse_sdf_points_views
        N = resolution
        # Grid bound from the splats, like the reference (:274-276):
        # R = min(q95(|contract(normalize(xyz))|) + 0.01, 1.9). A fixed
        # near-2 box would (a) sample the surface region ~R/2 coarser and
        # (b) reach corner radii |y| > 2 where 1/(2-|y|) flips sign and
        # un-contraction reflects grid points back INSIDE the scene,
        # emitting phantom sheets.
        state = getattr(self, "state", None)
        if state is not None:
            means = np.asarray(state.params.xyz)
            active = np.asarray(state.active).astype(bool)
            if active.shape[0] == means.shape[0]:
                means = means[active]
            ynorm = np.linalg.norm((means - self.center) / self.radius,
                                   axis=-1)
            cmag = np.where(ynorm < 1, ynorm,
                            2 - 1 / np.maximum(ynorm, 1e-9))
        else:
            cmag = np.zeros((0,))
        R = float(min(np.quantile(cmag, 0.95) + 0.01, 1.9)) if len(cmag) \
            else 1.9
        lin = np.linspace(-R, R, N).astype(np.float32)
        voxel = float(lin[1] - lin[0]) if N > 1 else 1.0
        origin_c = np.array([lin[0]] * 3, np.float32)

        # group views by resolution so per-view tensors stack; fusion of
        # weight-1 running means across groups merges exactly by weights
        groups = {}
        for i, cd in enumerate(self.viewpoints):
            groups.setdefault((cd.camera.width, cd.camera.height),
                              []).append(i)
        stacked = []
        for (w, h), idxs in groups.items():
            stacked.append((
                w, h,
                jnp.asarray(np.stack([self.depthmaps[i].reshape(h, w)
                                      for i in idxs])),
                jnp.asarray(np.stack([self.rgbmaps[i].reshape(3, h, w)
                                      for i in idxs])),
                jnp.asarray(np.stack([self.alphamaps[i].reshape(h, w)
                                      for i in idxs])),
                jnp.asarray(np.stack([np.asarray(
                    self.viewpoints[i].camera.world_view)
                    for i in idxs])),
                # (W-1)/(2·tan): the reference samples with grid_sample
                # align_corners=True, i.e. u = ndc·(W-1)/2 + (W-1)/2
                # (mesh_utils.py:217-219) — W/(2·tan) would skew border
                # taps by ~0.5 px (the bounded path, like Open3D, keeps
                # fx = W/(2·tan); tsdf.py:158 centers both at (W-1)/2)
                jnp.asarray([fov2focal(self.viewpoints[i].camera.fovx,
                                       w - 1)
                             for i in idxs], dtype=jnp.float32),
                jnp.asarray([fov2focal(self.viewpoints[i].camera.fovy,
                                       h - 1)
                             for i in idxs], dtype=jnp.float32),
            ))

        fuse = jax.jit(fuse_sdf_points_views, static_argnames=(
            "width", "height"))

        def block_sdf(i0s, i1s):
            """Fused (sdf, w, col) for grid points [i0, i1) per axis."""
            axes = [lin[i0:i1] for i0, i1 in zip(i0s, i1s)]
            grid = np.stack(np.meshgrid(*axes, indexing="ij"),
                            -1).reshape(-1, 3)
            r = np.linalg.norm(grid, axis=-1)
            # adaptive truncation ∝ 1/(2-|y|) (reference :229-232), in
            # WORLD units: sdf = sampled_depth - z is world-scale, and
            # the reference's voxel_size = radius*2/N carries the scene
            # radius (a contracted-unit band is radius-x too narrow).
            # Deliberately R-independent: the reference defines
            # voxel_size from the FULL ±2 span (:269) even though its
            # grid spans ±R.
            trunc = (5 * (2 / N) / scale * np.where(
                r > 1, 1.0 / (2 - np.minimum(r, 1.9)), 1.0)
            ).astype(np.float32)
            world = uncontract(grid) / scale + self.center
            pts_d = jnp.asarray(world.astype(np.float32))
            trunc_d = jnp.asarray(trunc)
            sdf_n = np.zeros(len(grid), np.float32)
            w_n = np.zeros(len(grid), np.float32)
            col_n = np.zeros((len(grid), 3), np.float32)
            for (w, h, dep, rgb, al, wv, fxs, fys) in stacked:
                s_g, w_g, c_g = jax.device_get(fuse(
                    pts_d, trunc_d, dep, rgb, al, wv, fxs, fys,
                    width=w, height=h))
                sdf_n += s_g * w_g
                w_n += w_g
                col_n += c_g * w_g[:, None]
            # reference init: tsdfs = 1 with weights = 1 — a unit prior
            # folded into the running mean ((1 + Σd)/(1 + n)); colors
            # share the weight with a zero prior
            denom = 1.0 + w_n
            sdf_n = (1.0 + sdf_n) / denom
            col_n = col_n / denom[:, None]
            shape = tuple(i1 - i0 for i0, i1 in zip(i0s, i1s))
            return (sdf_n.reshape(shape), w_n.reshape(shape),
                    col_n.reshape(shape + (3,)))

        # block starts with one-point overlap: cubes [s, e-1) per block
        starts = list(range(0, max(N - 1, 1), max(block_size - 1, 1)))
        all_vc, all_faces, all_cols = [], [], []
        for sx in starts:
            for sy in starts:
                for sz in starts:
                    i0s = (sx, sy, sz)
                    i1s = tuple(min(s + block_size, N) for s in i0s)
                    sdf_b, w_b, col_b = block_sdf(i0s, i1s)
                    if not ((sdf_b < 0).any() and (sdf_b > 0).any()):
                        continue
                    vc, fc = marching_tets(
                        sdf_b.astype(np.float64),
                        origin=origin_c + np.array(i0s) * voxel,
                        voxel_size=voxel, mask=w_b > 0)
                    if len(fc) == 0:
                        continue
                    gi = np.clip(np.round(
                        (vc - (origin_c + np.array(i0s) * voxel))
                        / voxel).astype(np.int64), 0,
                        np.array(sdf_b.shape) - 1)
                    all_cols.append(col_b[gi[:, 0], gi[:, 1], gi[:, 2]])
                    all_vc.append(vc)
                    all_faces.append(fc)
        if not all_vc:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int64),
                    np.zeros((0, 3), np.float32))

        # weld across block boundaries: quantize to the 1/1024-voxel
        # lattice (the same grid marching_tets dedupes on per block)
        offs = np.cumsum([0] + [len(v) for v in all_vc[:-1]])
        verts_c = np.concatenate(all_vc)
        faces = np.concatenate(
            [f + o for f, o in zip(all_faces, offs)])
        cols = np.concatenate(all_cols)
        keys = np.round((verts_c - origin_c) / voxel * 1024.0).astype(
            np.int64)
        uniq, first, inv = np.unique(keys, axis=0, return_index=True,
                                     return_inverse=True)
        verts_c = verts_c[first]
        cols = cols[first]
        faces = inv[faces]
        ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
              & (faces[:, 0] != faces[:, 2]))
        faces = faces[ok]

        # clip un-contracted world vertices like the reference
        # (mcube_utils.py:91-93): a crossing at contracted radius
        # 2-ε un-contracts through 1/(2-|y|) to arbitrarily far points
        verts = uncontract(verts_c) / scale + self.center
        verts = np.clip(verts, -max_range, max_range)
        return verts.astype(np.float32), faces, cols.astype(np.float32)

    def _sample_colors(self, vol: TSDFVolume, verts: np.ndarray):
        if len(verts) == 0:
            return np.zeros((0, 3), np.float32)
        g = (verts - np.asarray(vol.origin)) / vol.voxel_size
        gi = np.clip(g.astype(np.int64), 0,
                     np.array(vol.tsdf.shape) - 1)
        return np.asarray(vol.color)[gi[:, 0], gi[:, 1], gi[:, 2]]

    def export_image(self, path: str):
        """renders/, gt/, vis/ layout (reference :296-312)."""
        from PIL import Image
        os.makedirs(os.path.join(path, "renders"), exist_ok=True)
        os.makedirs(os.path.join(path, "gt"), exist_ok=True)
        os.makedirs(os.path.join(path, "vis"), exist_ok=True)
        for idx, cd in enumerate(self.viewpoints):
            def save(arr, sub, name):
                img = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(path, sub, name))
            save(self.rgbmaps[idx].transpose(1, 2, 0), "renders",
                 f"{idx:05d}.png")
            if cd.image is not None:
                save(cd.image.transpose(1, 2, 0), "gt", f"{idx:05d}.png")
            d = self.depthmaps[idx][0]
            save(np.stack([d / max(d.max(), 1e-6)] * 3, -1), "vis",
                 f"depth_{idx:05d}.png")
            save(self.normalmaps[idx].transpose(1, 2, 0) * 0.5 + 0.5,
                 "vis", f"normal_{idx:05d}.png")


def post_process_mesh(verts, faces, colors=None, num_cluster=50):
    """Keep the num_cluster largest edge-connected components, dropping
    clusters under the reference's 50-triangle floor
    (reference utils/mesh_utils.py:22-43: threshold =
    max(num_cluster-th largest size, 50))."""
    v2, f2, used = largest_clusters(verts, faces, num_clusters=num_cluster,
                                    min_faces=50)
    c2 = colors[used] if colors is not None else None
    return v2, f2, c2


def save_mesh(path, verts, faces, colors=None):
    write_mesh_ply(path, verts, faces, colors)
