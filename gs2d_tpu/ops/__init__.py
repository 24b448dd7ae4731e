"""Math and compute ops (pure functions, jnp/Pallas)."""
