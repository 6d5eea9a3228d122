"""Trilinear ray-marching renderer — fast approximate line integrals.

TPU-native reimplementation of the reference's ``Trilinear`` renderer
(diffdrr/renderers.py:186-254): sample ``n_points`` equispaced points between
the global entry/exit of the ray bundle, trilinearly interpolate the volume,
and integrate with the rectangular rule.

This module is the pure-XLA version (correctness oracle + CPU path);
``diffdrr_tpu.ops.pallas.raymarch`` provides the Pallas TPU kernel.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ._raygeom import alpha_minmax, points_at_alpha, reduce_img, scatter_channels
from .sampling import sample_volume

__all__ = ["trilinear_raycast"]


def trilinear_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    n_points: int = 500,
    voxel_shift: float = 0.5,
    mode: str = "trilinear",
    reducefn: Union[str, Callable] = "sum",
    eps: float = 1e-8,
    align_corners: bool = False,
    mask: Optional[jnp.ndarray] = None,
    n_channels: Optional[int] = None,
    alphamin: Optional[jnp.ndarray] = None,
    alphamax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render approximate line integrals by fixed-count ray marching.

    Args match :func:`diffdrr_tpu.ops.siddon.siddon_raycast`, plus:

      n_points: number of equispaced samples per ray (speed/quality knob,
        reference: renderers.py:211).
      alphamin / alphamax: optional precomputed global sampling interval
        (reference: renderers.py:214-215). When omitted they are derived from
        the ray bundle's entry/exit parameters, reduced to scalars with
        min/max over all rays (renderers.py:221-223).

    Returns (B, 1, N) integrals, or (B, C, N) with a mask.
    """
    dims = volume.shape
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    if alphamin is None or alphamax is None:
        amin, amax = alpha_minmax(source, target, dims, voxel_shift, eps)
        alphamin = jnp.min(amin)
        alphamax = jnp.max(amax)

    alphas = jnp.linspace(0.0, 1.0, n_points, dtype=volume.dtype)[None, None]
    alphas = alphas * (alphamax - alphamin) + alphamin

    xyzs = points_at_alpha(alphas, source, target, eps)
    img = sample_volume(volume, xyzs, mode=mode, voxel_shift=voxel_shift,
                        align_corners=align_corners)

    # Ray length x rectangular-rule step size. n_points=1 would divide by
    # zero (the Pallas counterpart clamps to 2 the same way).
    img = img * jnp.swapaxes(weights, -1, -2)
    step_size = (alphamax - alphamin) / max(n_points - 1, 1)
    img = img * step_size

    if mask is None:
        img = reduce_img(img, reducefn)
        return img[:, None, :]

    if n_channels is None:
        raise ValueError(
            "n_channels must be provided (static) when rendering with a mask"
        )
    channels = sample_volume(
        mask.astype(volume.dtype), xyzs, mode="nearest", voxel_shift=voxel_shift,
        align_corners=align_corners,
    ).astype(jnp.int32)
    return scatter_channels(img, channels, n_channels)
