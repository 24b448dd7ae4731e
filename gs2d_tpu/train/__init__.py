"""Training: masked Adam, losses, jitted step, checkpoints."""
