"""Device timing that survives async/tunneled backends.

On some backends (e.g. the experimental axon tunnel) ``block_until_ready``
returns before execution finishes and a host fetch costs a ~40 ms round
trip. ``timed_loop`` therefore chains ``n`` data-dependent executions of
the op, forces completion with a single tiny host fetch, and subtracts the
measured fetch round-trip, giving per-iteration wall time that reflects
device compute rather than enqueue cost.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _force(x) -> None:
    """Force completion of everything enqueued before ``x`` by fetching one
    scalar to the host (same stream ⇒ full drain)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def measure_rtt(n: int = 3) -> float:
    """Median host↔device round-trip (s) for a tiny fetch."""
    x = jnp.zeros((8, 128), jnp.float32)
    _force(x)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_loop(step: Callable, state, n: int = 10, warmup: int = 2):
    """Time ``state = step(state)`` chained ``n`` times.

    ``step`` must return something whose first leaf depends on the compute
    (data dependence prevents reordering/elision). Returns (seconds_per_iter,
    final_state).
    """
    for _ in range(warmup):
        state = step(state)
    _force(state)
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
    _force(state)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 0.0) / n, state
