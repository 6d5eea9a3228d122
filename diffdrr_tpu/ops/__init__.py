"""Rendering ops: pure-XLA reference renderers + Pallas TPU kernels."""

from .siddon import siddon_raycast
from .trilinear import trilinear_raycast
from .sampling import sample_volume

__all__ = ["siddon_raycast", "trilinear_raycast", "sample_volume"]
