"""Test config: force an 8-device CPU JAX before anything touches a backend.

The container boots with an `axon` TPU PJRT plugin pre-registered via
sitecustomize; tests run on a virtual 8-device CPU mesh instead so sharding
logic is exercised without TPU hardware (and Pallas kernels run in
interpreter mode).
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
