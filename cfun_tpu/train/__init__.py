"""Training subsystem: target assignment, losses, jit'd step, epoch loop."""
