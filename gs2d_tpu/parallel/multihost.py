"""Multi-host bring-up and host-local data placement.

The reference has no distributed backend (SURVEY.md §5.8: single process,
single cuda:0; multi-GPU is shell-level scene sharding). This module is
the TPU-native design for scaling ONE training run across hosts:

* ``initialize_distributed`` — `jax.distributed.initialize` bring-up.
  CRITICAL ordering contract: nothing here touches the JAX backend (no
  `jax.devices()`, no `jax.process_count()`) before `initialize` runs —
  backend-touching calls would initialize the single-process runtime and
  make every later distributed call a silent no-op.
* a single global ``Mesh`` over every chip of every host; the existing
  pixel-band sharding (data_parallel.py) and gauss-axis parameter sharding
  (gaussian_parallel.py) compile unchanged over it — GSPMD routes the
  collectives over ICI within a slice and DCN across hosts.
* host-local ground-truth placement: every process loads the images, but
  only its own pixel-row band is uploaded; ``global_gt_from_local_rows``
  assembles the global sharded array from per-process bands.
* SPMD execution rule: every process executes the same computations on
  the same camera schedule (seeded identically); only SIDE EFFECTS (file
  writes, TCP viewer, stdout/TensorBoard) are gated by
  ``is_main_process``.
* ``local_camera_shard`` — round-robin split of a camera/scene list per
  process, for embarrassingly-parallel *scene-level* sweeps (the analog of
  the reference's one-scene-per-GPU `scripts/run_all.sh:1-13`). Not used
  by the single-run training path, which shards pixels, not cameras.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

# Env vars whose presence signals a real multi-process launch (TPU pod
# runtimes and cluster launchers set one of these).
_POD_ENV_VARS = (
    "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> bool:
    """Bring up jax.distributed. Returns True if running multi-process.

    Must be called before ANY other JAX API that touches the backend.
    Explicit arguments force initialization (and failures propagate —
    a mis-launched pod must fail loudly, not silently fall back to
    single-process). With no arguments, initialization is attempted only
    when a launcher environment variable marks this as a distributed
    launch; otherwise the call is a no-op so single-process CLIs can call
    it unconditionally.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    if not explicit and not any(v in os.environ for v in _POD_ENV_VARS):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every chip of every host (process-major order)."""
    return Mesh(np.array(jax.devices()), (axis,))


def is_main_process() -> bool:
    return jax.process_index() == 0


def gt_sharding(mesh, axis: str = "data") -> NamedSharding:
    """Sharding of a (C, H, W) ground-truth image: rows over ``axis`` —
    matching the pixel-band output sharding of rasterize_sharded."""
    return NamedSharding(mesh, P(None, axis, None))


def local_row_range(mesh, height: int, axis: str = "data"):
    """[row0, row1) of a (C, height, W) gt image owned by this process.

    Rows are split evenly over the mesh axis; a process owns the union of
    its devices' bands (contiguous under process-major device order).
    """
    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} not divisible by mesh {n}"
    band = height // n
    # the row band is indexed by the device's coordinate ALONG the data
    # axis — on a 2-D (gauss, data) mesh the flattened device index runs
    # past n and would address rows beyond the image
    ax = mesh.axis_names.index(axis)
    devs = mesh.devices
    coords = [idx[ax] for idx, d in np.ndenumerate(devs)
              if d.process_index == jax.process_index()]
    assert coords, "this process owns no devices of the mesh"
    return min(coords) * band, (max(coords) + 1) * band


def global_gt_from_local_rows(local_band: np.ndarray, mesh, height: int,
                              axis: str = "data"):
    """Assemble the global (C, height, W) gt array from this process's
    row band (shape (C, rows_local, W), rows per ``local_row_range``)."""
    c, _, w = local_band.shape
    return jax.make_array_from_process_local_data(
        gt_sharding(mesh, axis), np.ascontiguousarray(local_band),
        (c, height, w))


def local_camera_shard(cameras, num_shards=None, shard_id=None):
    """Round-robin split for scene-level sweeps (one scene per process —
    the reference's `run_all.sh` pattern). Defaults to the jax process
    grid."""
    n = jax.process_count() if num_shards is None else num_shards
    i = jax.process_index() if shard_id is None else shard_id
    return [c for k, c in enumerate(cameras) if k % n == i]
