"""Pallas TPU kernels for the render hot path."""
