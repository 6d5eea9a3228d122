"""Joseph's method — plane-marching ray integration (TPU-first design).

This renderer is this framework's own contribution (it has no counterpart in
the reference library): instead of sorting all plane crossings (Siddon,
reference renderers.py:94-113) or sampling N equispaced points (Trilinear,
renderers.py:219-225), it marches along the volume's major axis and takes one
bilinearly interpolated sample per voxel plane — the classical Joseph
projector, standard in tomography.

Why it is the TPU-native choice (SURVEY §7): samples at plane k lie *inside
plane k*, so in-plane bilinear interpolation factors into tent-weight
contractions against a contiguous window of the plane — dense matmuls on the
MXU with zero gathers. The Pallas kernel (diffdrr_tpu/ops/pallas/joseph.py)
implements exactly that; this module is the XLA reference implementation used
for CPU testing and parity checks.

Accuracy: one sample per crossed plane is the same quadrature density as
Siddon (exact crossings) with trilinear instead of nearest interpolation —
at least as accurate as the reference's Trilinear at n_points = dim, with
sample placement that adapts to each ray.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import numpy as np
import jax.numpy as jnp

from ._raygeom import alpha_minmax, reduce_img, scatter_channels
from .sampling import sample_volume

__all__ = ["joseph_raycast", "choose_march_axis"]


def choose_march_axis(source: jnp.ndarray, target: jnp.ndarray) -> int:
    """Pick the volume axis most aligned with the mean ray direction.

    Host-side helper (requires concrete values): call outside jit and pass the
    result as the static ``axis`` argument.
    """
    d = np.asarray(target).mean(axis=tuple(range(np.ndim(target) - 1))) - np.asarray(
        source
    ).mean(axis=tuple(range(np.ndim(source) - 1)))
    return int(np.argmax(np.abs(d)))


def joseph_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    axis: int = 0,
    step: float = 1,
    n_steps: Optional[int] = None,
    voxel_shift: float = 0.5,
    reducefn: Union[str, Callable] = "sum",
    eps: float = 1e-8,
    mask: Optional[jnp.ndarray] = None,
    n_channels: Optional[int] = None,
) -> jnp.ndarray:
    """Render line integrals by marching voxel planes along ``axis``.

    Args match :func:`diffdrr_tpu.ops.siddon.siddon_raycast`, plus:

      axis: static volume axis to march along (use :func:`choose_march_axis`).
        Rays nearly perpendicular to this axis integrate poorly — pick the
        axis aligned with the viewing direction.
      step: march every ``step``-th plane (speed/quality knob: ``step=2``
        halves cost like halving the reference's ``n_points``). May be
        fractional: samples then sit between voxel planes (trilinearly
        interpolated along the axis too) — the XLA oracle for the Pallas
        ray-march/trilinear kernel (ops/pallas/raymarch.py).
      n_steps: number of samples (default: cover the whole axis).

    Returns (B, 1, N) integrals, or (B, C, N) with a mask.
    """
    dims = volume.shape
    X = dims[axis]
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    off = voxel_shift - 0.5  # align_corners=False index offset
    gs = source + off  # (B, 1, 3) in index coordinates
    gt = target + off  # (B, N, 3)
    d = gt - gs + eps

    # Axis sample coordinates along the march axis (voxel-center units).
    if n_steps is None:
        n_steps = int(-(-X // step))
    ks = jnp.arange(n_steps, dtype=volume.dtype) * step  # (K,)
    d_ax = d[..., axis]  # (B, N)
    alpha_k = (ks[None, None, :] - gs[..., axis : axis + 1]) / d_ax[..., None]  # (B, N, K)

    # Clip to the ray's slab interval (entry/exit of the whole volume).
    amin, amax = alpha_minmax(source, target, dims, voxel_shift, eps)
    in_slab = (alpha_k >= amin) & (alpha_k <= amax)

    # Sample points: exact plane coordinate along `axis`, interpolated in the
    # other two (a trilinear sample with a one-hot axis weight == bilinear).
    pts = gs[..., None, :] + alpha_k[..., None] * d[..., None, :]  # (B,N,K,3)
    pts = pts.at[..., axis].set(jnp.broadcast_to(ks, pts.shape[:-1]))

    # sample_volume re-applies the +off shift, so hand it raw voxel coords.
    vals = sample_volume(volume, pts - off, mode="trilinear",
                         voxel_shift=voxel_shift)

    # Quadrature: d(alpha) between adjacent marched planes, times ray length.
    dalpha = jnp.abs(step / d_ax)[..., None]  # (B, N, 1)
    img = vals * in_slab * dalpha * jnp.swapaxes(weights, -1, -2)

    if mask is None:
        img = reduce_img(img, reducefn)
        return img[:, None, :]

    if n_channels is None:
        raise ValueError(
            "n_channels must be provided (static) when rendering with a mask"
        )
    channels = sample_volume(
        mask.astype(volume.dtype), pts - off, mode="nearest",
        voxel_shift=voxel_shift,
    ).astype(jnp.int32)
    return scatter_channels(img, channels, n_channels)
