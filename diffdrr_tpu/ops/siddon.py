"""Siddon's method — exact radiological path-length ray integration.

TPU-native reimplementation of the reference's ``Siddon`` renderer
(diffdrr/renderers.py:11-91). The algorithm: each ray's intersections with
every axis-aligned voxel-grid plane partition the ray into segments that each
lie in exactly one voxel; the line integral is the sum of (voxel value x
segment length).

Two implementations live in this package:

  * this module — a pure-XLA version that mirrors the reference's vectorized
    formulation (compute all plane crossings, sort, midpoint-sample). It is
    the correctness oracle, runs everywhere (CPU/TPU), and is differentiable
    through standard JAX AD.
  * ``diffdrr_tpu.ops.pallas.siddon`` — a Pallas TPU kernel that traverses
    voxels sequentially per ray (DDA) with no sort and no (B, N, D)
    materialization. Used on the hot path.

Inputs are in *voxel space* (the orchestrator applies the world->voxel affine;
see diffdrr_tpu/drr.py), matching the reference's contract
(renderers.py:34-42).
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ._raygeom import alpha_minmax, points_at_alpha, reduce_img, scatter_channels
from .sampling import sample_volume

__all__ = ["siddon_raycast"]


def _get_alphas(
    source: jnp.ndarray,
    target: jnp.ndarray,
    dims,
    voxel_shift: float,
    eps: float,
    filter_intersections_outside_volume: bool,
) -> jnp.ndarray:
    """Sorted parametric intersections of each ray with all grid planes.

    Matches reference ``_get_alphas`` (renderers.py:94-113). The planes along
    axis ``d`` sit at ``{0, 1, ..., dims[d]} - voxel_shift`` in voxel space.

    ``filter_intersections_outside_volume``: the reference's implementation of
    this flag crashes (wrong arity call at renderers.py:118); we implement the
    *intended* behavior instead by clamping every crossing into the ray's
    [alphamin, alphamax] slab interval — out-of-volume segments collapse to
    zero length and contribute nothing, with no dynamic shapes.

    Default (False, matching the reference): the crossing set is NOT clipped
    to alpha in [0, 1], so a volume lying outside the source->target segment
    (e.g. behind the source) is still integrated — Siddon integrates the ray
    LINE, while Trilinear/Joseph clamp to the segment. Geometries where this
    matters are pathological (the volume should sit between source and
    detector); pass ``filter_intersections_outside_volume=True`` to clamp.
    """
    d0, d1, d2 = dims
    dtype = source.dtype
    planes_x = jnp.arange(d0 + 1, dtype=dtype) - voxel_shift
    planes_y = jnp.arange(d1 + 1, dtype=dtype) - voxel_shift
    planes_z = jnp.arange(d2 + 1, dtype=dtype) - voxel_shift

    sx, sy, sz = source[..., 0:1], source[..., 1:2], source[..., 2:3]
    tx, ty, tz = target[..., 0:1], target[..., 1:2], target[..., 2:3]
    ax = (planes_x - sx) / (tx - sx + eps)
    ay = (planes_y - sy) / (ty - sy + eps)
    az = (planes_z - sz) / (tz - sz + eps)
    alphas = jnp.concatenate([ax, ay, az], axis=-1)

    alphas = jnp.sort(alphas, axis=-1)
    if filter_intersections_outside_volume:
        alphamin, alphamax = alpha_minmax(source, target, dims, voxel_shift, eps)
        alphas = jnp.clip(alphas, alphamin, alphamax)
    return alphas


def siddon_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    voxel_shift: float = 0.5,
    mode: str = "nearest",
    stop_gradients_through_grid_sample: bool = False,
    filter_intersections_outside_volume: bool = False,
    reducefn: Union[str, Callable] = "sum",
    eps: float = 1e-8,
    align_corners: bool = False,
    mask: Optional[jnp.ndarray] = None,
    n_channels: Optional[int] = None,
) -> jnp.ndarray:
    """Render line integrals with Siddon's exact method.

    Args:
      volume: (X, Y, Z) voxel densities.
      source: (B, 1, 3) ray origins in voxel space.
      target: (B, N, 3) ray endpoints (detector pixels) in voxel space.
      weights: (B, 1, N) per-ray scale — the world-space ray length, supplied
        by the orchestrator (reference: drr.py:201). Defaults to ones.
      voxel_shift: 0.0 if voxel (0,0,0) sits at the grid corner, 0.5 if at the
        voxel center (reference: renderers.py:16).
      mode: sampling mode for the midpoint lookup; "nearest" is exact Siddon.
      stop_gradients_through_grid_sample: stop gradient flow through the voxel
        lookup (reference: renderers.py:18,63-65). With nearest sampling the
        lookup has zero gradient anyway; this additionally blocks the
        d(volume) path, which is what pose-only registration wants.
      filter_intersections_outside_volume: clamp crossings into the in-volume
        interval (see ``_get_alphas``; fixes the reference's broken flag).
      reducefn: "sum", "max", or a callable reducing the sample axis.
      mask: optional (X, Y, Z) integer labelmap; when given, contributions are
        accumulated per structure into ``n_channels`` output channels.
      n_channels: static channel count; required with ``mask`` (the reference
        host-syncs ``mask.max()+1``, renderers.py:81).

    Returns:
      (B, 1, N) line integrals, or (B, C, N) with a mask.
    """
    dims = volume.shape
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    alphas = _get_alphas(
        source, target, dims, voxel_shift, eps, filter_intersections_outside_volume
    )

    # Midpoints of adjacent crossings lie strictly inside one voxel each.
    alphamid = (alphas[..., :-1] + alphas[..., 1:]) / 2
    xyzs = points_at_alpha(alphamid, source, target, eps)

    img = sample_volume(volume, xyzs, mode=mode, voxel_shift=voxel_shift,
                        align_corners=align_corners)
    # Scale by the world-space ray length. The reference performs this
    # product inside its no_grad block (renderers.py:63-65 pass the length
    # image into _get_voxel), so under the stop-gradients flag the pose
    # gradient flows only through the intersection lengths below.
    img = img * jnp.swapaxes(weights, -1, -2)  # (B, N, S) * (B, N, 1)
    if stop_gradients_through_grid_sample:
        img = jax.lax.stop_gradient(img)

    # Scale by the per-segment parametric length.
    intersection_length = jnp.diff(alphas, axis=-1)
    img = img * intersection_length

    if mask is None:
        img = reduce_img(img, reducefn)
        return img[:, None, :]

    if n_channels is None:
        raise ValueError(
            "n_channels must be provided (static) when rendering with a mask"
        )
    # Labels are IDs, never interpolated: always nearest regardless of the
    # value-sampling mode (matches joseph.py/trilinear.py and the kernels).
    channels = sample_volume(
        mask.astype(volume.dtype), xyzs, mode="nearest",
        voxel_shift=voxel_shift, align_corners=align_corners,
    ).astype(jnp.int32)
    return scatter_channels(img, channels, n_channels)
