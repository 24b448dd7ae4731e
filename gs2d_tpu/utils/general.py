"""LR schedules and small helpers (reference utils/general_utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Log-linear LR decay with optional sine-ramped delay.

    Contract of /root/reference/utils/general_utils.py:29-62 (itself the
    JaxNeRF schedule), jnp-traced over ``step``; returns 0 when disabled.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(np.log(max(lr_init, 1e-30)) * (1 - t)
                       + np.log(max(lr_final, 1e-30)) * t)
    active = (step >= 0) & (lr_init > 0 or lr_final > 0)
    return jnp.where(active, delay_rate * log_lerp, 0.0)


