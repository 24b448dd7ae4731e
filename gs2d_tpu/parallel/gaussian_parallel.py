"""Gaussian-axis parameter sharding ("phase B" of SURVEY.md §7 step 8).

The reference is single-GPU (SURVEY.md §2.5); this layer is new TPU-native
design. On a 2-D ``("gauss", "data")`` mesh:

* every capacity-sized model array — parameters, Adam moments,
  densification statistics, the screen-offset gradient input — is sharded
  along axis 0 over ``gauss`` (the ZeRO analog: per-chip parameter +
  optimizer memory drops by the axis size, so scene capacity scales with
  the pod, not the chip),
* the per-Gaussian preprocess (projection, SH, culling — pure elementwise
  over N) partitions along the same axis for free under GSPMD,
* the pixel-band rasterizer (data_parallel.py) splits the image over ALL
  mesh axes, so the ``gauss`` axis also contributes rasterization
  throughput; GSPMD inserts exactly one all-gather of the preprocessed
  per-Gaussian records at the shard_map boundary (forward) and its
  transpose reduce-scatter of the per-Gaussian gradients (backward), both
  riding ICI,
* masked densification (clone/split/prune) is elementwise over slots and
  keeps the sharding.

Everything is expressed as ``with_sharding_constraint`` — there is no
second code path; the same jitted step runs unsharded when the mesh has no
``gauss`` axis.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

GAUSS_AXIS = "gauss"


def has_gauss_axis(mesh) -> bool:
    return mesh is not None and GAUSS_AXIS in mesh.axis_names \
        and mesh.shape[GAUSS_AXIS] > 1


def shard_capacity_tree(tree, mesh):
    """Constrain every leaf of a capacity-sized pytree (leading dim =
    slot capacity) to be sharded along ``gauss``; no-op without the axis."""
    if not has_gauss_axis(mesh):
        return tree
    sh = NamedSharding(mesh, P(GAUSS_AXIS))

    def constrain(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.lax.with_sharding_constraint(x, sh)
        return x

    return jax.tree.map(constrain, tree)


def check_capacity(capacity: int, mesh) -> None:
    if has_gauss_axis(mesh):
        g = mesh.shape[GAUSS_AXIS]
        if capacity % g != 0:
            raise ValueError(
                f"slot capacity {capacity} must be divisible by the "
                f"gauss mesh axis ({g}) for even parameter sharding")
