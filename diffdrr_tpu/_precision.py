"""True-f32 matmul policy for the geometry chain.

On TPU, float32 matmuls/einsums/convs run at bf16-compute/f32-accumulate by
DEFAULT. For the big rendering contractions that is the intended (and
bit-controlled) policy — the Pallas kernels pin their own precision
explicitly (ops/pallas/joseph.py ``_dot``). But the SMALL geometry matmuls
around them (pose composition, applying an SE(3) to ray endpoints, the
detector's calibration, loss einsums) are a different story: coordinates are
O(100 mm) and tent-weight integrands are sensitive to sub-voxel positions,
so bf16 rounding there was measured to corrupt TPU pose gradients by ~100%
relative error vs the CPU reference (round 3; the rendered IMAGE only moves
~1e-3, which is why forward parity never caught it — both kernel and oracle
shared the same rounded rays).

``f32_matmuls`` wraps a function so everything it traces uses
``jax.default_matmul_precision("highest")``. These matmuls contract over
3-4 element dims — forcing true f32 costs nothing measurable, and the pose
gradients match CPU to ~3e-4 (tests/test_tpu_hardware.py).

Applied at the library's public entry points: pose algebra, detector,
DRR.forward/render/projections, metrics, and the XLA oracle renderers.
Nesting is harmless; the Pallas ``_dot`` opts out via an explicit
``Precision.DEFAULT``.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision("highest")``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
