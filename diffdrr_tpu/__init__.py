"""diffdrr_tpu — TPU-native differentiable X-ray rendering (JAX/XLA/Pallas).

A ground-up reimplementation of the capabilities of DiffDRR
(https://github.com/eigenvivek/DiffDRR) designed for TPU hardware: functional
core over pytrees, jit everywhere, Pallas kernels on the hot path, and
`jax.sharding` for multi-chip scaling.
"""

__version__ = "0.1.0"

from .drr import DRR
from .data import read, load_example_ct, Subject, Image, transform_hu_to_density
from .detector import Detector
from .pose import RigidTransform, convert

__all__ = [
    "DRR",
    "Detector",
    "RigidTransform",
    "convert",
    "read",
    "load_example_ct",
    "Subject",
    "Image",
    "transform_hu_to_density",
]


_SUBMODULES = (
    "checkpoint", "data", "detector", "drr", "meshops", "metrics", "nifti",
    "ops", "parallel", "pose", "profiling", "registration", "scene_html",
    "utils", "viz", "native",
)


def __getattr__(name):
    """Lazy submodule access (``diffdrr_tpu.metrics`` etc.) without importing
    heavy optional dependencies (matplotlib, flax) at package import."""
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
