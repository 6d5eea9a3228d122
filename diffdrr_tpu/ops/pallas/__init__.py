"""Pallas TPU kernels — the production compute path."""
