"""Shared ray-geometry helpers for the DRR renderers.

Behavioral equivalents of the reference's module-level helpers
(diffdrr/renderers.py:94-183), written as pure jax.numpy functions.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp

__all__ = ["alpha_minmax", "points_at_alpha", "reduce_img", "scatter_channels"]


def alpha_minmax(
    source: jnp.ndarray,
    target: jnp.ndarray,
    dims: Tuple[int, int, int],
    voxel_shift: float,
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit parametric coordinates of each ray with the volume slab.

    Matches reference ``_get_alpha_minmax`` (renderers.py:124-140) including
    its ``dims + 1`` upper plane (one voxel beyond the last plane — a quirk of
    the reference that its Trilinear renderer depends on) and the clamp of the
    result into [0, 1].
    """
    dims_arr = jnp.asarray(dims, source.dtype)
    sdd = target - source + eps
    min_plane = jnp.zeros((3,), source.dtype) - voxel_shift
    max_plane = (dims_arr + 1.0) - voxel_shift
    alpha0 = (min_plane - source) / sdd
    alpha1 = (max_plane - source) / sdd
    alphamin = jnp.max(jnp.minimum(alpha0, alpha1), axis=-1, keepdims=True)
    alphamax = jnp.min(jnp.maximum(alpha0, alpha1), axis=-1, keepdims=True)
    alphamin = jnp.where(alphamin < 0.0, 0.0, alphamin)
    alphamax = jnp.where(alphamax > 1.0, 1.0, alphamax)
    return alphamin, alphamax


def points_at_alpha(
    alpha: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    eps: float,
) -> jnp.ndarray:
    """Voxel-space points ``source + alpha * (target - source + eps)``.

    Equivalent of the geometric half of reference ``_get_xyzs``
    (renderers.py:143-149); the [-1, 1] grid normalization is folded into
    :func:`diffdrr_tpu.ops.sampling.sample_volume` instead.

    Shapes: ``alpha (B, N, S)`` or ``(1, 1, S)``, ``source (B, 1, 3)``,
    ``target (B, N, 3)`` -> ``(B, N, S, 3)``.
    """
    return source[..., None, :] + alpha[..., None] * (target - source + eps)[
        ..., None, :
    ]


def reduce_img(img: jnp.ndarray, reducefn: Union[str, Callable]) -> jnp.ndarray:
    """Combine per-sample contributions along each ray (renderers.py:175-183)."""
    if reducefn == "sum":
        return jnp.sum(img, axis=-1)
    elif reducefn == "max":
        return jnp.max(img, axis=-1)
    elif callable(reducefn):
        return reducefn(img)
    else:
        raise ValueError(f"Only supports reducefn 'sum' or 'max', not {reducefn}")


def scatter_channels(
    img: jnp.ndarray, channels: jnp.ndarray, n_channels: int
) -> jnp.ndarray:
    """Accumulate per-sample contributions into per-structure channels.

    ``img (B, N, S)``, ``channels (B, N, S)`` int -> ``(B, C, N)``.
    TPU-native equivalent of the reference's ``scatter_add_`` trick
    (renderers.py:74-89). ``n_channels`` must be static (the reference
    host-syncs ``mask.max().item()``; we take it as an argument).
    """
    B, N, S = img.shape
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    n_idx = jnp.arange(N, dtype=jnp.int32)[None, :, None]
    out = jnp.zeros((B, n_channels, N), img.dtype)
    return out.at[b_idx, channels, n_idx].add(img, mode="drop")
