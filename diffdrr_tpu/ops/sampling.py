"""Volume sampling ops — the TPU-native replacement for ``grid_sample``.

The reference library funnels all of its compute through
``torch.nn.functional.grid_sample`` (reference: diffdrr/renderers.py:8,156-169).
Here we implement the equivalent sampling semantics directly in JAX as flat
gathers, which XLA lowers to TPU gather ops, and which Pallas kernels can
replace wholesale on the hot path.

Semantics matched to the reference renderers' usage:

  * The reference permutes the volume to (z, y, x) and feeds normalized
    coordinates ``g = 2 * (p + voxel_shift) / dims - 1`` with
    ``align_corners=False`` (renderers.py:143-169). Unwinding grid_sample's
    unnormalization, the sampled voxel-space index along each axis is exactly
    ``idx = p + voxel_shift - 0.5``. We take points ``p`` in voxel coordinates
    directly and apply that offset — no detour through [-1, 1].
  * ``mode="nearest"`` rounds half-to-even (torch uses ``std::nearbyint``);
    ``jnp.round`` matches.
  * Out-of-bounds samples return 0 (grid_sample ``padding_mode="zeros"``).
  * Gradients w.r.t. points are zero in nearest mode (piecewise-constant),
    matching torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_volume", "sample_nearest", "sample_trilinear"]


def _flat_gather(volume: jnp.ndarray, ix, iy, iz, valid) -> jnp.ndarray:
    """Gather volume[ix, iy, iz] with zero fill where ``valid`` is False."""
    d0, d1, d2 = volume.shape
    if d0 * d1 * d2 >= 2**31:
        # The flattened index is int32 (JAX default); letting it wrap would
        # silently gather wrong voxels. Volumes this large belong on the
        # slab-sharded path (parallel.slab_sharded_*).
        raise ValueError(
            f"volume with {d0 * d1 * d2} elements overflows int32 flat "
            f"indexing; shard it (parallel.slab_sharded_*) or downsample"
        )
    ix = jnp.clip(ix, 0, d0 - 1)
    iy = jnp.clip(iy, 0, d1 - 1)
    iz = jnp.clip(iz, 0, d2 - 1)
    flat_idx = (ix * d1 + iy) * d2 + iz
    vals = jnp.take(volume.reshape(-1), flat_idx, axis=0)
    return jnp.where(valid, vals, jnp.zeros((), volume.dtype))


def _in_bounds(i, lo, hi):
    return (i >= lo) & (i <= hi)


def sample_nearest(
    volume: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-neighbor sample at fractional voxel indices ``idx`` (..., 3).

    ``idx`` is already in index space (offset applied by the caller).
    """
    # torch's grid_sampler uses nearbyint (round half to even); jnp.round matches.
    n = jnp.round(idx)
    ix = n[..., 0].astype(jnp.int32)
    iy = n[..., 1].astype(jnp.int32)
    iz = n[..., 2].astype(jnp.int32)
    d0, d1, d2 = volume.shape
    valid = (
        _in_bounds(ix, 0, d0 - 1) & _in_bounds(iy, 0, d1 - 1) & _in_bounds(iz, 0, d2 - 1)
    )
    return _flat_gather(volume, ix, iy, iz, valid)


def sample_trilinear(volume: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolated sample at fractional voxel indices (..., 3).

    Zero padding: corners outside the volume contribute 0, matching
    grid_sample(padding_mode="zeros", align_corners=False).
    """
    d0, d1, d2 = volume.shape
    x, y, z = idx[..., 0], idx[..., 1], idx[..., 2]
    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0f, y - y0f, z - z0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1

    vx0 = _in_bounds(x0, 0, d0 - 1)
    vx1 = _in_bounds(x1, 0, d0 - 1)
    vy0 = _in_bounds(y0, 0, d1 - 1)
    vy1 = _in_bounds(y1, 0, d1 - 1)
    vz0 = _in_bounds(z0, 0, d2 - 1)
    vz1 = _in_bounds(z1, 0, d2 - 1)

    c000 = _flat_gather(volume, x0, y0, z0, vx0 & vy0 & vz0)
    c100 = _flat_gather(volume, x1, y0, z0, vx1 & vy0 & vz0)
    c010 = _flat_gather(volume, x0, y1, z0, vx0 & vy1 & vz0)
    c110 = _flat_gather(volume, x1, y1, z0, vx1 & vy1 & vz0)
    c001 = _flat_gather(volume, x0, y0, z1, vx0 & vy0 & vz1)
    c101 = _flat_gather(volume, x1, y0, z1, vx1 & vy0 & vz1)
    c011 = _flat_gather(volume, x0, y1, z1, vx0 & vy1 & vz1)
    c111 = _flat_gather(volume, x1, y1, z1, vx1 & vy1 & vz1)

    wx0, wx1 = 1.0 - fx, fx
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz

    return (
        c000 * wx0 * wy0 * wz0
        + c100 * wx1 * wy0 * wz0
        + c010 * wx0 * wy1 * wz0
        + c110 * wx1 * wy1 * wz0
        + c001 * wx0 * wy0 * wz1
        + c101 * wx1 * wy0 * wz1
        + c011 * wx0 * wy1 * wz1
        + c111 * wx1 * wy1 * wz1
    )


def sample_volume(
    volume: jnp.ndarray,
    points: jnp.ndarray,
    mode: str = "trilinear",
    voxel_shift: float = 0.5,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``volume`` at voxel-space ``points`` (..., 3).

    Equivalent of the reference's ``_get_voxel`` + normalization pipeline
    (renderers.py:143-169) with the [-1, 1] round-trip algebraically removed.
    """
    if align_corners:
        # grid_sample align_corners=True: idx = (g + 1) / 2 * (dim - 1) with
        # g = 2 * (p + shift) / dim - 1  =>  idx = (p + shift) * (dim - 1) / dim
        dims = jnp.asarray(volume.shape, points.dtype)
        idx = (points + voxel_shift) * (dims - 1.0) / dims
    else:
        idx = points + (voxel_shift - 0.5)
    if mode in ("trilinear", "bilinear", "linear"):
        return sample_trilinear(volume, idx)
    elif mode == "nearest":
        return sample_nearest(volume, idx)
    else:
        raise ValueError(f"Unknown sampling mode {mode!r}")
