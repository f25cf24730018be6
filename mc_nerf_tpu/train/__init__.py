"""Training: losses, optimizers, jitted stage steps, and the engine."""
