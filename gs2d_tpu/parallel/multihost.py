"""Multi-host initialization and mesh construction.

The reference has no distributed backend (SURVEY.md §5.8); this is the
TPU-native design: `jax.distributed.initialize` (coordinator discovery via
the standard env vars on TPU pods), a single global Mesh over all chips,
per-host data loading of the camera shards, and process-0-only logging.
Collectives compile to ICI within a slice and DCN across hosts via XLA.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> None:
    """Idempotent jax.distributed bring-up (no-op on a single process)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every chip of every host."""
    return Mesh(np.array(jax.devices()), (axis,))


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_camera_shard(cameras, axis_size: int | None = None):
    """Round-robin camera assignment per process — each host loads only
    its own images (host-local IO; the pixel shard inside a step is
    orthogonal)."""
    n = jax.process_count()
    i = jax.process_index()
    return [c for k, c in enumerate(cameras) if k % n == i]
