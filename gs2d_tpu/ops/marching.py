"""Marching tetrahedra isosurface extraction (numpy, dependency-free).

Replaces the reference's skimage marching-cubes step
(utils/mcube_utils.py:17-95). Each voxel cube is split into 6 tetrahedra;
every tet contributes 0-2 triangles with vertices linearly interpolated on
crossing edges. The 16 tet sign cases are enumerated directly (no external
lookup tables needed). Triangles are oriented so normals point toward
positive SDF (outside). Vertices are deduplicated by quantized position.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# cube corner offsets (x, y, z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# six tetrahedra covering the cube (indices into _CORNERS, sharing the
# main diagonal 0-6)
_TETS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6],
], np.int32)


def _interp(p_a, p_b, f_a, f_b):
    t = f_a / np.where(np.abs(f_a - f_b) < 1e-12, 1e-12, f_a - f_b)
    t = np.clip(t, 0.0, 1.0)[..., None]
    return p_a + t * (p_b - p_a)


def marching_tets(sdf: np.ndarray, origin=np.zeros(3), voxel_size=1.0,
                  mask: np.ndarray | None = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """sdf (X, Y, Z) → (vertices (V, 3), faces (F, 3)). Isolevel 0;
    negative = inside. ``mask`` marks valid voxels (e.g. weight > 0)."""
    X, Y, Z = sdf.shape
    if mask is None:
        mask = np.ones_like(sdf, bool)

    # corner values per cube: (X-1, Y-1, Z-1, 8)
    def corner(c):
        dx, dy, dz = _CORNERS[c]
        return sdf[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]

    def corner_mask(c):
        dx, dy, dz = _CORNERS[c]
        return mask[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]

    vals = np.stack([corner(c) for c in range(8)], -1)
    valid = np.stack([corner_mask(c) for c in range(8)], -1).all(-1)
    sign = vals < 0
    active = valid & sign.any(-1) & (~sign).any(-1)
    if not active.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    idx = np.argwhere(active)                      # (C, 3)
    cube_vals = vals[active]                       # (C, 8)
    base = idx.astype(np.float64)                  # cube origin in voxels
    corner_pos = base[:, None, :] + _CORNERS[None]  # (C, 8, 3)

    tris = []
    for tet in _TETS:
        f = cube_vals[:, tet]                      # (C, 4)
        p = corner_pos[:, tet]                     # (C, 4, 3)
        inside = f < 0                             # (C, 4)
        n_in = inside.sum(-1)

        for n_target, flip in ((1, False), (3, True)):
            sel = n_in == n_target
            if not sel.any():
                continue
            fi, pi = f[sel], p[sel]
            ins = (fi < 0) if not flip else (fi >= 0)
            # the lone vertex (inside for n=1, outside for n=3)
            lone = np.argmax(ins, -1)
            others = np.argsort(~ins, -1, kind="stable")[:, 1:]  # 3 others
            rows = np.arange(len(fi))
            pl = pi[rows, lone]
            fl = fi[rows, lone]
            tri = np.stack([
                _interp(pl, pi[rows, others[:, k]], fl,
                        fi[rows, others[:, k]]) for k in range(3)], axis=1)
            tris.append(tri)

        sel = n_in == 2
        if sel.any():
            fi, pi = f[sel], p[sel]
            ins = fi < 0
            order = np.argsort(~ins, -1, kind="stable")
            a, b = order[:, 0], order[:, 1]        # inside
            c, d = order[:, 2], order[:, 3]        # outside
            rows = np.arange(len(fi))
            pac = _interp(pi[rows, a], pi[rows, c], fi[rows, a], fi[rows, c])
            pad = _interp(pi[rows, a], pi[rows, d], fi[rows, a], fi[rows, d])
            pbc = _interp(pi[rows, b], pi[rows, c], fi[rows, b], fi[rows, c])
            pbd = _interp(pi[rows, b], pi[rows, d], fi[rows, b], fi[rows, d])
            tris.append(np.stack([pac, pbc, pbd], 1))
            tris.append(np.stack([pac, pbd, pad], 1))

    tri = np.concatenate(tris, 0)                  # (T, 3, 3) voxel coords

    # orient: normal should point from inside (f<0) to outside (f>0) —
    # approximate SDF gradient by central differences at the centroid
    cent = tri.mean(1)
    ci = np.clip(cent.round().astype(np.int64), 0,
                 np.array(sdf.shape) - 2)
    gx = sdf[ci[:, 0] + 1, ci[:, 1], ci[:, 2]] - sdf[ci[:, 0], ci[:, 1],
                                                     ci[:, 2]]
    gy = sdf[ci[:, 0], ci[:, 1] + 1, ci[:, 2]] - sdf[ci[:, 0], ci[:, 1],
                                                     ci[:, 2]]
    gz = sdf[ci[:, 0], ci[:, 1], ci[:, 2] + 1] - sdf[ci[:, 0], ci[:, 1],
                                                     ci[:, 2]]
    grad = np.stack([gx, gy, gz], -1)
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = (nrm * grad).sum(-1) < 0
    tri[flip] = tri[flip][:, ::-1]

    # dedupe vertices
    flat = tri.reshape(-1, 3)
    keys = np.round(flat * 1024.0).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3))
    np.add.at(verts, inv, flat)
    counts = np.bincount(inv, minlength=len(uniq))
    verts /= counts[:, None]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    verts_world = verts * voxel_size + np.asarray(origin)
    return verts_world.astype(np.float32), faces.astype(np.int64)


def largest_clusters(verts: np.ndarray, faces: np.ndarray,
                     num_clusters: int = 1, min_faces: int = 0):
    """Keep the largest EDGE-connected face clusters — replaces Open3D's
    cluster_connected_triangles post-process (utils/mesh_utils.py:22-43).

    Open3D clusters triangles through shared EDGES, so two components
    touching at a single welded vertex stay separate clusters; vertex
    connectivity would merge them and mis-rank sizes. The reference then
    removes every cluster smaller than max(num_clusters-th largest,
    min_faces) triangles (mesh_utils.py:35-37 — ties keep extras; when
    fewer clusters exist than num_clusters we floor at the smallest
    instead of the reference's IndexError). Returns
    (verts, faces, kept_vertex_indices)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    if len(faces) == 0:
        return verts, faces, np.arange(n)
    F = len(faces)
    # canonical (min, max) edge keys, 3 per face
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]]).astype(np.int64)
    e.sort(axis=1)
    keys = e[:, 0] * np.int64(n) + e[:, 1]
    uniq_keys, edge_id = np.unique(keys, return_inverse=True)
    E = len(uniq_keys)
    face_id = np.tile(np.arange(F, dtype=np.int64), 3)
    # bipartite edge↔face graph: a component = one edge-connected cluster
    g = sp.coo_matrix(
        (np.ones(3 * F, np.int8), (edge_id, E + face_id)),
        shape=(E + F, E + F))
    _, labels = connected_components(g, directed=False)
    face_label = labels[E + np.arange(F)]
    sizes = np.bincount(face_label, minlength=int(labels.max()) + 1)
    present = np.sort(sizes[sizes > 0])[::-1]
    kth = int(present[min(num_clusters, len(present)) - 1])
    thresh = max(kth, min_faces, 1)
    keep = sizes[face_label] >= thresh
    faces2 = faces[keep]
    used = np.unique(faces2)
    remap = -np.ones(n, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces2], used
