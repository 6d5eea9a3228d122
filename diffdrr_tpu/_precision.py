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
3-4 element dims, so forcing true f32 costs nothing measurable THERE, and
the pose gradients match CPU to ~3e-4 (tests/test_tpu_hardware.py).

Decoration points (exact list — coverage elsewhere is indirect, via these):

- ``pose.py``: ``RigidTransform.__call__/inverse/compose/get_se3_log``,
  ``RigidTransform.convert``, and the module-level ``convert`` — every
  geometry matmul in DRR.forward/render and Detector.__call__ flows through
  a RigidTransform apply/compose, which is where the corruption lived.
- ``drr.py``: ``perspective_projection`` / ``inverse_projection``.
- ``metrics.py``: the SE(3) geodesics (tiny pose matmuls), see below.

NOT decorated: ``DRR.forward/render`` themselves, ``Detector.__call__``,
the ``ops/`` oracle renderers (their einsums are coordinate transforms
already covered via RigidTransform, plus tent/one-hot contractions that are
deliberately left at the default MXU policy), and — since round 4 — the
IMAGE metrics (NCC family, Sobel, MI). Those run patch²-sized convolutions
and bin²-sized einsums where "highest" costs 3x on the MXU; measured on
hardware (tools/ab_f32metrics.py, round 4), decorating them cost ~14% of
end-to-end registration throughput while changing the recovered pose by
nothing observable (the NCC loss surface is smooth in image intensities;
the precision-critical path is the geometry, not the similarity score).
``f32_image_metrics`` keeps an escape hatch: set
``DIFFDRR_TPU_F32_METRICS=1`` to restore "highest" there.

Nesting is harmless; the Pallas ``_dot`` opts out via an explicit
``Precision.DEFAULT``.
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["f32_matmuls", "f32_image_metrics"]


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision("highest")``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def f32_image_metrics(fn):
    """Like :func:`f32_matmuls`, but only when ``DIFFDRR_TPU_F32_METRICS=1``.

    Image-similarity metrics (NCC/Sobel/MI) are numerically tolerant of the
    TPU's default bf16-compute/f32-accumulate policy and pay a real MXU cost
    for "highest" (patch²/bin² contraction dims); see the module docstring.
    The env var is read at call time, so tests can flip it per-case.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if os.environ.get("DIFFDRR_TPU_F32_METRICS") == "1":
            with jax.default_matmul_precision("highest"):
                return fn(*args, **kwargs)
        return fn(*args, **kwargs)

    return wrapped
