"""The DRR orchestrator — differentiable X-ray rendering, end to end.

TPU-native reimplementation of the reference's ``DRR`` nn.Module
(diffdrr/drr.py:23-312). Design departures (SURVEY §7):

  * ``DRR`` is a registered JAX pytree: density/mask/affine/detector arrays
    are leaves, config is static aux data. A ``DRR`` instance can be passed
    straight through ``jax.jit``/``grad``/``vmap`` and sharded.
  * ``render`` takes the density volume explicitly — the deliberate API seam
    that makes volume reconstruction differentiable w.r.t. density
    (reference: drr.py:191-194, SURVEY §3.4).
  * ``checkpoint_gradients`` maps to ``jax.checkpoint`` (rematerialization)
    instead of torch.utils.checkpoint (reference: drr.py:176-185).
  * ``patch_size`` serial chunking is kept for memory parity (drr.py:217-225),
    but the Pallas renderers make it largely unnecessary on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from .data import Subject
from .detector import Detector
from .ops.joseph import joseph_raycast
from .ops.siddon import siddon_raycast
from .ops.trilinear import trilinear_raycast
from .pose import RigidTransform, convert

__all__ = ["DRR", "reshape_subsampled_drr"]


class _Static:
    """Hashable identity wrapper so host-side objects can ride in pytree aux."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return id(self.value)

    def __eq__(self, other):
        return isinstance(other, _Static) and other.value is self.value


_RENDERERS = {
    "siddon": siddon_raycast,
    "trilinear": trilinear_raycast,
    "joseph": joseph_raycast,
}


class DRR:
    """Computes differentiable digitally reconstructed radiographs.

    Constructor surface matches the reference DRR module (drr.py:26-46).
    """

    def __init__(
        self,
        subject: Subject,
        sdd: float,
        height: int,
        delx: float,
        width: Optional[int] = None,
        dely: Optional[float] = None,
        x0: float = 0.0,
        y0: float = 0.0,
        p_subsample: Optional[float] = None,
        reshape: bool = True,
        reverse_x_axis: bool = True,
        patch_size: Optional[int] = None,
        renderer: str = "siddon",
        voxel_shift: float = 0.5,
        persistent: bool = True,  # kept for API parity; pytrees have no state_dict
        compile_renderer: bool = False,  # everything is jit-compiled; parity no-op
        checkpoint_gradients: bool = False,
        **renderer_kwargs,
    ):
        del persistent, compile_renderer
        width = height if width is None else width
        dely = delx if dely is None else dely
        n_subsample = (
            int(height * width * p_subsample) if p_subsample is not None else None
        )

        self.detector = Detector(
            sdd,
            height,
            width,
            delx,
            dely,
            x0,
            y0,
            jnp.asarray(subject.reorient, jnp.float32),
            n_subsample=n_subsample,
            reverse_x_axis=reverse_x_axis,
        )

        self.subject = subject
        affine = np.asarray(subject.volume.affine, np.float32)[None]
        self._affine = jnp.asarray(affine)
        self._affine_inverse = jnp.asarray(np.linalg.inv(affine))
        self.density = jnp.asarray(np.asarray(subject.density.data), jnp.float32)
        if subject.mask is not None:
            self.mask = jnp.asarray(
                np.asarray(subject.mask.data), jnp.float32
            )
            self.n_channels = int(np.asarray(subject.mask.data).max()) + 1
        else:
            self.mask = None
            self.n_channels = None

        if renderer not in _RENDERERS:
            raise ValueError(
                f"renderer must be one of {sorted(_RENDERERS)}, not {renderer}"
            )
        self.renderer_name = renderer
        self.voxel_shift = voxel_shift
        self.renderer_kwargs = dict(renderer_kwargs)
        self.reshape = reshape
        self.patch_size = patch_size
        self.checkpoint_gradients = checkpoint_gradients

        # --- Joseph / Pallas static planning (host-side, at construction) ---
        # Default march axis: the volume axis most aligned with the principal
        # ray direction at the identity pose (reorient . canonical +z mapped
        # through the world->voxel affine). A per-call `axis` kwarg overrides.
        reorient_R = np.asarray(subject.reorient, np.float64)[:3, :3]
        affine_inv_R = np.asarray(np.linalg.inv(affine[0]), np.float64)[:3, :3]
        principal = affine_inv_R @ reorient_R @ np.array([0.0, 0.0, 1.0])
        self.march_axis = int(np.argmax(np.abs(principal)))
        # Pallas window sizing: a `tile`-pixel detector tile spans at most
        # tile * pixel_spacing / voxel_spacing voxels in-plane (magnification
        # <= 1 toward the source), plus interpolation/alignment slack.
        spacing = np.sqrt((affine[0][:3, :3] ** 2).sum(axis=0))
        tile_override = self.renderer_kwargs.pop("pallas_tile", None)

        # Footprint scale: the static bound assumes worst-case magnification
        # (samples at the detector plane, alpha = 1). Geometries that keep the
        # volume near the isocenter only reach alpha ~ 0.5-0.7; lowering
        # pallas_fp_scale shrinks windows (and cost) accordingly — at the
        # caller's own risk of clipping peripheral samples.
        fp_scale = float(self.renderer_kwargs.pop("pallas_fp_scale", 1.0))

        def _windows(tile):
            # A tile-pixel detector tile spans at most tile * pixel_spacing /
            # voxel_spacing voxels in-plane (magnification <= 1 toward the
            # source), plus interpolation/alignment slack.
            fp = int(
                np.ceil(
                    tile * max(delx, dely) / float(spacing.min()) * 1.35
                    * fp_scale
                )
            ) + 6
            # +2 placement slack, +15 start-alignment loss, 16-aligned size
            # (covers the bf16 (16, 128) HBM tiling).
            ky = -(-(fp + 18) // 16) * 16
            # Compute window (zc) must cover the footprint; the DMA window
            # (zw) additionally absorbs up to 127 lanes of 128-alignment
            # slack and must itself be a multiple of 128 (HBM lane tiling).
            zc = max(64, -(-(fp + 2) // 64) * 64)
            zw = -(-(zc + 127) // 128) * 128
            return ky, zc, zw

        if tile_override is not None:
            self.pallas_tile = int(tile_override)
        else:
            # Largest tile whose VMEM windows stay within budget: bigger
            # tiles amortize per-plane work, smaller tiles shrink windows.
            for tile in (32, 16, 8):
                self.pallas_tile = tile
                if _windows(tile)[0] <= 208:
                    break
        self.pallas_ky, self.pallas_zc, self.pallas_zw = _windows(self.pallas_tile)
        self.pallas_precision = self.renderer_kwargs.pop("precision", "f32")
        # bf16 storage halves the kernel's volume DMA traffic. Under the
        # default precision policy the MXU computes in bf16 regardless, so
        # results are bit-identical — it is a pure win and the default.
        # True-f32 runs (precision="highest") keep f32 storage.
        default_storage = None if self.pallas_precision == "highest" else "bf16"
        self.pallas_storage = self.renderer_kwargs.pop("storage", default_storage)
        backend = jax.default_backend()
        self.use_pallas = backend in ("tpu", "axon") and self.pallas_ky <= 256

    # ------------------------------------------------------------------ pytree
    def tree_flatten(self):
        children = (
            self.detector,
            self._affine,
            self._affine_inverse,
            self.density,
            self.mask,
        )
        aux = (
            _Static(self.subject),
            self.n_channels,
            self.renderer_name,
            self.voxel_shift,
            tuple(sorted(self.renderer_kwargs.items())),
            self.reshape,
            self.patch_size,
            self.checkpoint_gradients,
            self.march_axis,
            self.pallas_tile,
            self.pallas_ky,
            self.pallas_zw,
            self.pallas_zc,
            self.pallas_precision,
            self.pallas_storage,
            self.use_pallas,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (
            obj.detector,
            obj._affine,
            obj._affine_inverse,
            obj.density,
            obj.mask,
        ) = children
        (
            subject_static,
            obj.n_channels,
            obj.renderer_name,
            obj.voxel_shift,
            renderer_kwargs,
            obj.reshape,
            obj.patch_size,
            obj.checkpoint_gradients,
            obj.march_axis,
            obj.pallas_tile,
            obj.pallas_ky,
            obj.pallas_zw,
            obj.pallas_zc,
            obj.pallas_precision,
            obj.pallas_storage,
            obj.use_pallas,
        ) = aux
        obj.subject = subject_static.value
        obj.renderer_kwargs = dict(renderer_kwargs)
        return obj

    # -------------------------------------------------------------- properties
    @property
    def affine(self) -> RigidTransform:
        return RigidTransform(self._affine)

    @property
    def affine_inverse(self) -> RigidTransform:
        return RigidTransform(self._affine_inverse)

    @property
    def n_patches(self) -> int:
        return (self.detector.height * self.detector.width) // (self.patch_size**2)

    @property
    def dtype(self):
        return self.density.dtype

    # ----------------------------------------------------------------- forward
    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(
        self,
        *args,
        parameterization: Optional[str] = None,
        convention: Optional[str] = None,
        calibration: Optional[RigidTransform] = None,
        mask_to_channels: bool = False,
        degrees: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        """Generate DRR(s) from pose parameters (reference: drr.py:155-188)."""
        if parameterization is None:
            pose = args[0]
        else:
            pose = convert(
                *args,
                parameterization=parameterization,
                convention=convention,
                degrees=degrees,
            )

        source, target = self.detector(pose, calibration)

        render = self.render
        if self.checkpoint_gradients:
            render = jax.checkpoint(
                partial(self.render, mask_to_channels=mask_to_channels, **kwargs)
            )
            img = render(self.density, source, target)
        else:
            img = render(
                self.density, source, target, mask_to_channels=mask_to_channels,
                **kwargs,
            )
        return self.reshape_transform(img, batch_size=len(pose))

    def render(
        self,
        density: jnp.ndarray,
        source: jnp.ndarray,
        target: jnp.ndarray,
        mask_to_channels: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        """Render line integrals for world-space rays (reference: drr.py:191-227).

        ``density`` is an explicit argument (not read from ``self``) so
        reconstruction can differentiate w.r.t. a free density pytree leaf.
        """
        # Per-ray world-space length scales the parametric integral.
        weights = jnp.linalg.norm(target - source, axis=-1)[:, None, :]

        # World -> voxel space.
        source = self.affine_inverse(source)
        target = self.affine_inverse(target)

        renderer = _RENDERERS[self.renderer_name]
        opts = dict(self.renderer_kwargs)
        opts.update(kwargs)
        opts["voxel_shift"] = self.voxel_shift
        if mask_to_channels:
            opts["mask"] = self.mask
            opts["n_channels"] = self.n_channels

        # Pallas fast paths: full-frame Joseph / exact-Siddon renders on TPU.
        use_pallas = (
            self.use_pallas
            and self.renderer_name in ("joseph", "siddon")
            and not mask_to_channels
            and self.patch_size is None
            and self.detector.n_subsample is None
            and not opts.pop("force_xla", False)
        )
        if self.renderer_name == "siddon" and use_pallas:
            # The slab kernel implements the reference's default options;
            # exotic combinations fall back to the sort-based XLA renderer.
            use_pallas = (
                opts.get("mode", "nearest") == "nearest"
                and opts.get("reducefn", "sum") == "sum"
                and not opts.get("align_corners", False)
            )
            if use_pallas and opts.get("stop_gradients_through_grid_sample", False):
                # Nearest sampling already has zero value-gradients w.r.t.
                # pose; this additionally blocks the density path.
                density = jax.lax.stop_gradient(density)

        if use_pallas:
            # March axis: static if the caller pinned one, otherwise selected
            # at runtime from the mean ray direction via lax.switch over the
            # three axis-specialized renders (jit-safe pose dependence).
            axis = opts.pop("axis", None)
            common = dict(
                image_shape=(self.detector.height, self.detector.width),
                voxel_shift=self.voxel_shift,
                tile=self.pallas_tile,
                ky=self.pallas_ky,
                zw=self.pallas_zw,
                zc=self.pallas_zc,
                precision=self.pallas_precision,
                storage=self.pallas_storage,
            )
            if self.renderer_name == "joseph":
                from .ops.pallas.joseph import joseph_pallas_raycast

                def render_axis(ax):
                    return partial(
                        joseph_pallas_raycast, axis=ax,
                        step=opts.get("step", 1), **common,
                    )
            else:
                from .ops.pallas.siddon import siddon_pallas_raycast

                def render_axis(ax):
                    return partial(siddon_pallas_raycast, axis=ax, **common)

            if axis is not None:
                return render_axis(axis)(density, source, target, weights)
            d = jnp.mean(target - source, axis=(0, 1))
            idx = jnp.argmax(jnp.abs(d))
            return jax.lax.switch(
                idx,
                [render_axis(a) for a in range(3)],
                density,
                source,
                target,
                weights,
            )

        opts.pop("force_xla", None)
        if self.renderer_name == "joseph":
            axis = opts.pop("axis", None)
            if axis is None:
                d = jnp.mean(target - source, axis=(0, 1))
                idx = jnp.argmax(jnp.abs(d))
                return jax.lax.switch(
                    idx,
                    [partial(renderer, axis=a, **opts) for a in range(3)],
                    density, source, target, weights,
                )
            opts["axis"] = axis
        if self.patch_size is None:
            return renderer(density, source, target, weights, **opts)

        n = self.n_patches
        targets = jnp.split(target, n, axis=1)
        weight_chunks = jnp.split(weights, n, axis=-1)
        partials = [
            renderer(density, source, t, w, **opts)
            for t, w in zip(targets, weight_chunks)
        ]
        return jnp.concatenate(partials, axis=-1)

    def reshape_transform(self, img: jnp.ndarray, batch_size: int) -> jnp.ndarray:
        if self.reshape:
            if self.detector.n_subsample is None:
                img = img.reshape(
                    batch_size, -1, self.detector.height, self.detector.width
                )
            else:
                img = reshape_subsampled_drr(img, self.detector, batch_size)
        return img

    # ----------------------------------------------- runtime intrinsics swaps
    def set_intrinsics_(
        self,
        sdd: Optional[float] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        delx: Optional[float] = None,
        dely: Optional[float] = None,
        x0: Optional[float] = None,
        y0: Optional[float] = None,
        n_subsample: Optional[int] = None,
        reverse_x_axis: Optional[bool] = None,
    ) -> None:
        """Set new intrinsic parameters in place (reference: drr.py:230-255)."""
        self.detector = Detector(
            sdd if sdd is not None else self.detector.sdd,
            height if height is not None else self.detector.height,
            width if width is not None else self.detector.width,
            delx if delx is not None else self.detector.delx,
            dely if dely is not None else self.detector.dely,
            x0 if x0 is not None else self.detector.x0,
            y0 if y0 is not None else self.detector.y0,
            self.detector._reorient,
            n_subsample if n_subsample is not None else self.detector.n_subsample,
            reverse_x_axis
            if reverse_x_axis is not None
            else self.detector.reverse_x_axis,
        )

    def rescale_detector_(self, scale: float) -> None:
        """Rescale the detector plane in place (reference: drr.py:258-266)."""
        self.set_intrinsics_(
            height=int(self.detector.height * scale),
            width=int(self.detector.width * scale),
            delx=float(self.detector.delx / scale),
            dely=float(self.detector.dely / scale),
        )

    # ------------------------------------------------------------- projections
    def perspective_projection(
        self, pose: RigidTransform, pts: jnp.ndarray
    ) -> jnp.ndarray:
        """Project world points (3D) onto the pixel plane (2D).

        Reference: drr.py:269-290.
        """
        extrinsic = (self.detector.reorient.compose(pose)).inverse()
        x = extrinsic(pts)
        x = jnp.einsum("ij,bnj->bni", self.detector.intrinsic, x)
        z = x[..., -1:]
        x = x / z
        x1 = self.detector.height - x[..., 1]
        x0 = x[..., 0]
        if self.detector.reverse_x_axis:
            x0 = self.detector.width - x0
        return jnp.stack([x0, x1], axis=-1)

    def inverse_projection(
        self, pose: RigidTransform, pts: jnp.ndarray
    ) -> jnp.ndarray:
        """Backproject pixel points (2D) onto the image plane in world (3D).

        Reference: drr.py:296-312.
        """
        x1 = self.detector.height - pts[..., 1]
        x0 = pts[..., 0]
        if self.detector.reverse_x_axis:
            x0 = self.detector.width - x0
        pts = jnp.stack([x0, x1], axis=-1)
        homogeneous = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        intrinsic_inv = jnp.linalg.inv(self.detector.intrinsic)
        x = self.detector.sdd * jnp.einsum("ij,bnj->bni", intrinsic_inv, homogeneous)
        extrinsic = self.detector.reorient.compose(pose)
        return extrinsic(x)


jax.tree_util.register_pytree_node(
    DRR, lambda d: d.tree_flatten(), DRR.tree_unflatten
)


def reshape_subsampled_drr(
    img: jnp.ndarray, detector: Detector, batch_size: int
) -> jnp.ndarray:
    """Scatter sparse rays back into a full image (reference: drr.py:142-147)."""
    n_points = detector.height * detector.width
    drr = jnp.zeros((batch_size, n_points), img.dtype)
    idx = jnp.asarray(detector.subsamples[-1], jnp.int32)
    flat = img.reshape(batch_size, -1)
    drr = drr.at[:, idx].set(flat)
    return drr.reshape(batch_size, 1, detector.height, detector.width)
