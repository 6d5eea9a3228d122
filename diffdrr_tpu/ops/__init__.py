"""Rendering ops: pure-XLA reference renderers + Pallas TPU kernels."""

from .siddon import siddon_raycast
from .trilinear import trilinear_raycast
from .joseph import joseph_raycast, choose_march_axis
from .sampling import sample_volume

__all__ = [
    "siddon_raycast",
    "trilinear_raycast",
    "joseph_raycast",
    "choose_march_axis",
    "sample_volume",
]
