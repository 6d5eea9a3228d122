"""Multi-chip rendering and reconstruction via jax.sharding.

The reference is strictly single-process, single-device (SURVEY §2.2); this
module adds the distribution layer the TPU build calls for:

  * **Ray sharding** (the context-parallel analog, SURVEY §5): detector rays
    are embarrassingly parallel, so the canonical detector plane is sharded
    along the ray axis across the mesh; the volume is replicated. XLA inserts
    an all-gather of image tiles only at assembly, riding ICI.
  * **Data parallelism**: batches of poses shard along the ``data`` axis.
  * **Volume slab sharding** (the ring-attention-like variant for volumes too
    large to replicate): the volume is split along its leading axis via
    ``shard_map``; each device integrates its slab's contribution (zero
    outside), and a single ``psum`` assembles the full line integrals.
  * **Reconstruction**: per-view gradients w.r.t. the replicated density are
    combined by XLA's automatic ``psum`` under ``jit`` — the TPU-native
    equivalent of gradient all-reduce.

Multi-host note: on a real multi-host slice, call
``jax.distributed.initialize()`` first; every function here takes an explicit
``Mesh`` and works identically over ICI (intra-slice) or DCN (inter-slice)
meshes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..drr import DRR
from ..ops._raygeom import reduce_img
from ..pose import convert

__all__ = [
    "make_mesh",
    "shard_drr",
    "make_sharded_render",
    "slab_sharded_raycast",
    "slab_sharded_joseph",
    "slab_sharded_siddon",
    "make_reconstruction_step",
]


def make_mesh(
    axis_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data", "rays"),
    devices=None,
) -> Mesh:
    """Build a device mesh. Defaults to (1, n_devices) over ("data", "rays")."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shape is None:
        axis_shape = (1,) * (len(axis_names) - 1) + (n,)
    mesh_devices = np.asarray(devices).reshape(axis_shape)
    return Mesh(mesh_devices, axis_names)


def shard_drr(drr: DRR, mesh: Mesh, ray_axis: str = "rays") -> DRR:
    """Place a DRR's arrays on the mesh: rays sharded, volume replicated.

    The detector's canonical target plane (the ray axis) is split across
    ``ray_axis``; density/mask/affine are replicated. Downstream renders under
    ``jit`` inherit the layout, so each device traces only its detector tile.
    """
    replicated = NamedSharding(mesh, P())
    ray_sharded = NamedSharding(mesh, P(None, ray_axis, None))

    def place(x, sharding):
        return jax.device_put(x, sharding)

    leaves, treedef = jax.tree_util.tree_flatten(drr)
    drr = jax.tree_util.tree_unflatten(treedef, leaves)  # shallow copy
    det = drr.detector
    n_rays = det.target.shape[1]
    if n_rays % mesh.shape[ray_axis] == 0:
        det.target = place(det.target, ray_sharded)
    else:  # fall back to replication when indivisible
        det.target = place(det.target, replicated)
    det.source = place(det.source, replicated)
    det._reorient = place(det._reorient, replicated)
    det._calibration = place(det._calibration, replicated)
    drr.density = place(drr.density, replicated)
    if drr.mask is not None:
        drr.mask = place(drr.mask, replicated)
    drr._affine = place(drr._affine, replicated)
    drr._affine_inverse = place(drr._affine_inverse, replicated)
    return drr


def make_sharded_render(
    drr: DRR,
    mesh: Mesh,
    parameterization: str,
    convention: Optional[str] = None,
    data_axis: str = "data",
    ray_axis: str = "rays",
    **render_kwargs,
) -> Callable:
    """Jit a pose-batched render with DP over poses and SP over rays.

    Returns ``render(rotation, translation) -> (B, C, H, W)`` where the pose
    batch is sharded over ``data_axis`` and each pose's rays over ``ray_axis``.
    """
    drr = shard_drr(drr, mesh, ray_axis)
    batch_sharding = NamedSharding(mesh, P(data_axis))

    # ``drr`` rides through jit as an ARGUMENT (it is a pytree): capturing
    # it in the closure would embed the density + cached prepped volumes as
    # HLO constants in every compile request.
    @partial(jax.jit, static_argnames=())
    def render(drr, rotation, translation):
        return drr(
            rotation,
            translation,
            parameterization=parameterization,
            convention=convention,
            **render_kwargs,
        )

    def wrapped(rotation, translation):
        rotation = jax.device_put(rotation, batch_sharding)
        translation = jax.device_put(translation, batch_sharding)
        return render(drr, rotation, translation)

    return wrapped


# -----------------------------------------------------------------------------
# Volume slab sharding (shard_map + psum)
# -----------------------------------------------------------------------------


def slab_sharded_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    mesh: Mesh,
    axis: str = "rays",
    *,
    n_points: int = 500,
    voxel_shift: float = 0.5,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Trilinear raycast with the volume sharded in slabs along its x-axis.

    For volumes too large to replicate per-chip: device ``i`` holds slab
    ``[i*S : (i+1)*S)`` and evaluates only the x-corner ROW terms its slab
    owns — trilinear interpolation splits exactly into two row terms, each
    entirely local to one slab, so NO halo exchange is needed; a single
    ``psum`` over the mesh axis assembles the full integrals.
    Communication: one (B, 1, N) image reduce per render.
    """
    n_dev = mesh.shape[axis]
    X = volume.shape[0]
    if X % n_dev != 0:
        raise ValueError(f"volume x-dim {X} not divisible by mesh axis {n_dev}")
    S = X // n_dev
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    # Global sampling interval (same on every device).
    from ..ops._raygeom import alpha_minmax

    amin, amax = alpha_minmax(source, target, volume.shape, voxel_shift, eps)
    alphamin = jnp.min(amin)
    alphamax = jnp.max(amax)
    step = (alphamax - alphamin) / max(n_points - 1, 1)  # match the oracle

    def local(volume_slab, source, target, weights):
        # Trilinear interpolation splits exactly into its two x-corner row
        # terms: (1 - fx) * bilinear(row x0) + fx * bilinear(row x0 + 1).
        # Each row term is entirely local to the slab that owns the row, so
        # no halo exchange is needed — the final psum assembles the integral.
        idx = jax.lax.axis_index(axis)
        x_start = idx * S
        alphas = (
            jnp.linspace(0.0, 1.0, n_points, dtype=volume_slab.dtype)[None, None]
            * (alphamax - alphamin)
            + alphamin
        )
        pts = source[..., None, :] + alphas[..., None] * (
            target - source + eps
        )[..., None, :]

        off = voxel_shift - 0.5  # grid_sample align_corners=False offset
        gx = pts[..., 0] + off
        gy = pts[..., 1] + off
        gz = pts[..., 2] + off
        x0 = jnp.floor(gx)
        fx = gx - x0

        d1, d2 = volume_slab.shape[1], volume_slab.shape[2]
        y0 = jnp.floor(gy)
        z0 = jnp.floor(gz)
        fy, fz = gy - y0, gz - z0
        y0i = y0.astype(jnp.int32)
        z0i = z0.astype(jnp.int32)

        def bilinear_at_row(row_global, weight_x):
            """(y, z)-bilinear sample of a single x-row, masked to this slab."""
            local_row = row_global.astype(jnp.int32) - x_start
            in_slab = (local_row >= 0) & (local_row < S)
            r = jnp.clip(local_row, 0, S - 1)

            def g(yi, zi, wy, wz):
                valid = (
                    in_slab
                    & (yi >= 0) & (yi < d1) & (zi >= 0) & (zi < d2)
                )
                yc = jnp.clip(yi, 0, d1 - 1)
                zc = jnp.clip(zi, 0, d2 - 1)
                flat = (r * d1 + yc) * d2 + zc
                vals = jnp.take(volume_slab.reshape(-1), flat, axis=0)
                return jnp.where(valid, vals * wy * wz, 0.0)

            v = (
                g(y0i, z0i, 1 - fy, 1 - fz)
                + g(y0i + 1, z0i, fy, 1 - fz)
                + g(y0i, z0i + 1, 1 - fy, fz)
                + g(y0i + 1, z0i + 1, fy, fz)
            )
            return v * weight_x

        vals = bilinear_at_row(x0, 1.0 - fx) + bilinear_at_row(x0 + 1.0, fx)
        img = vals * jnp.swapaxes(weights, -1, -2) * step
        img = reduce_img(img, "sum")[:, None, :]
        return jax.lax.psum(img, axis)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
    )(volume, source, target, weights)


def slab_sharded_joseph(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    mesh: Mesh,
    axis: str = "rays",
    *,
    march_axis: int = 0,
    step: int = 1,
    voxel_shift: float = 0.5,
    eps: float = 1e-8,
    use_pallas: bool = False,
    image_shape: Optional[Tuple[int, int]] = None,
    pallas_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """Joseph plane-march render with the volume sharded in march-axis slabs.

    The production >HBM-volume path: device ``i`` holds planes
    ``[i*S, (i+1)*S)`` of the march axis. Joseph samples lie *inside* single
    planes (in-plane bilinear only), so the slab decomposition is exact with
    **zero halo exchange**: each device marches its own planes (ray
    coordinates shifted so local plane ``j`` is global plane ``i*S + j``) and
    one ``psum`` over the mesh axis assembles the full line integrals.

    ``use_pallas=True`` runs the production Pallas kernel per slab (pass
    ``image_shape`` and optionally ``pallas_kwargs`` with tile/ky/zw/zc from
    ``DRR.pallas_cfg``); the default XLA path works on any backend.
    """
    n_dev = mesh.shape[axis]
    X = volume.shape[march_axis]
    if X % n_dev != 0:
        raise ValueError(f"march axis {X} not divisible by mesh axis {n_dev}")
    S = X // n_dev
    if S % step != 0:
        raise ValueError(f"slab size {S} must be a multiple of step {step}")
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    from ..ops.joseph import joseph_raycast

    def local(volume_slab, source, target, weights):
        idx = jax.lax.axis_index(axis)
        offset = (idx * S).astype(source.dtype)
        shift = jnp.zeros((3,), source.dtype).at[march_axis].set(offset)
        src_l = source - shift
        tgt_l = target - shift
        if use_pallas:
            from ..ops.pallas.joseph import joseph_pallas_raycast

            img = joseph_pallas_raycast(
                volume_slab, src_l, tgt_l, weights,
                image_shape=image_shape, axis=march_axis, step=step,
                voxel_shift=voxel_shift, eps=eps, **(pallas_kwargs or {}),
            )
        else:
            img = joseph_raycast(
                volume_slab, src_l, tgt_l, weights, axis=march_axis,
                step=step, voxel_shift=voxel_shift, eps=eps,
            )
        return jax.lax.psum(img, axis)

    from jax import shard_map

    spec = [None, None, None]
    spec[march_axis] = axis
    # Pallas calls inside shard_map predate the varying-mesh-axes (vma)
    # annotation; disable the check on that path.
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(*spec), P(), P(), P()),
        out_specs=P(),
        check_vma=not use_pallas,
    )(volume, source, target, weights)


def slab_sharded_siddon(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    mesh: Mesh,
    axis: str = "rays",
    *,
    slab_axis: int = 0,
    voxel_shift: float = 0.5,
    eps: float = 1e-8,
    use_pallas: bool = False,
    image_shape: Optional[Tuple[int, int]] = None,
    pallas_kwargs: Optional[dict] = None,
) -> jnp.ndarray:
    """EXACT Siddon render with the volume sharded in slabs along one axis.

    Exactness of the decomposition: Siddon segments are delimited by grid-
    plane crossings, and every slab boundary IS a grid plane — so no segment
    straddles two slabs, each segment's midpoint voxel lies in exactly one
    slab, and the per-slab sub-volume renders partition the full integral.
    Each device renders its slab with ray endpoints shifted into slab-local
    coordinates (zero contribution outside its box — "outside is air"), and
    one ``psum`` over the mesh axis assembles the exact full integral, with
    zero halo exchange.

    ``use_pallas=True`` runs the production exact-Siddon Pallas kernel per
    slab (marching along ``slab_axis``; pass ``image_shape`` and optionally
    tile/ky/zw/zc via ``pallas_kwargs``) — the >HBM-volume path on TPU. The
    default XLA sort-based oracle works on any backend.
    """
    n_dev = mesh.shape[axis]
    X = volume.shape[slab_axis]
    if X % n_dev != 0:
        raise ValueError(f"slab axis {X} not divisible by mesh axis {n_dev}")
    S = X // n_dev
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)

    from ..ops.siddon import siddon_raycast

    def local(volume_slab, source, target, weights):
        idx = jax.lax.axis_index(axis)
        offset = (idx * S).astype(source.dtype)
        shift = jnp.zeros((3,), source.dtype).at[slab_axis].set(offset)
        src_l = source - shift
        tgt_l = target - shift
        if use_pallas:
            from ..ops.pallas.siddon import siddon_pallas_raycast

            img = siddon_pallas_raycast(
                volume_slab, src_l, tgt_l, weights,
                image_shape=image_shape, axis=slab_axis,
                voxel_shift=voxel_shift, eps=eps, **(pallas_kwargs or {}),
            )
        else:
            img = siddon_raycast(
                volume_slab, src_l, tgt_l, weights,
                voxel_shift=voxel_shift, eps=eps,
            )
        return jax.lax.psum(img, axis)

    from jax import shard_map

    spec = [None, None, None]
    spec[slab_axis] = axis
    # Pallas calls inside shard_map predate the varying-mesh-axes (vma)
    # annotation; disable the check on that path.
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(*spec), P(), P(), P()),
        out_specs=P(),
        check_vma=not use_pallas,
    )(volume, source, target, weights)


# -----------------------------------------------------------------------------
# Distributed reconstruction step
# -----------------------------------------------------------------------------


def make_reconstruction_step(
    drr: DRR,
    mesh: Mesh,
    parameterization: str = "euler_angles",
    convention: Optional[str] = "ZXY",
    lr: float = 1e-2,
    data_axis: str = "data",
    ray_axis: str = "rays",
    **render_kwargs,
):
    """Distributed differentiable CT reconstruction step (SURVEY §3.4).

    Views (poses + measured images) are sharded over ``data_axis``; rays over
    ``ray_axis``; the density parameter is replicated and its gradient is
    all-reduced automatically by XLA under ``jit``. Returns (init, step).
    """
    import optax

    drr = shard_drr(drr, mesh, ray_axis)
    # Density-only differentiation: the fused value+gradient forward (which
    # optimizes POSE backwards) would waste a gradient march here — the ray
    # cotangents are dead. Use the lean forward kernel.
    render_kwargs.setdefault("fused_pose_bwd", False)
    tx = optax.adam(lr)
    batch_sharding = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())

    def init_fn(density0: jnp.ndarray):
        density0 = jax.device_put(density0, replicated)
        return density0, tx.init(density0)

    def loss_fn(drr, density, rotation, translation, measured):
        pose = convert(
            rotation, translation, parameterization=parameterization,
            convention=convention,
        )
        source, target = drr.detector(pose, None)
        img = drr.render(density, source, target, **render_kwargs)
        img = drr.reshape_transform(img, batch_size=len(pose))
        return jnp.mean((img - measured) ** 2)

    # ``drr`` is a jit argument, not a closure capture (see make_sharded_render).
    @jax.jit
    def step_fn(drr, density, opt_state, rotation, translation, measured):
        loss, grads = jax.value_and_grad(loss_fn, argnums=1)(
            drr, density, rotation, translation, measured
        )
        updates, opt_state = tx.update(grads, opt_state, density)
        density = optax.apply_updates(density, updates)
        return density, opt_state, loss

    def wrapped_step(density, opt_state, rotation, translation, measured):
        rotation = jax.device_put(rotation, batch_sharding)
        translation = jax.device_put(translation, batch_sharding)
        measured = jax.device_put(measured, batch_sharding)
        return step_fn(drr, density, opt_state, rotation, translation,
                       measured)

    return init_fn, wrapped_step
