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
  * On TPU every renderer runs Pallas kernels: exact Siddon and Joseph
    plane-marching (ops/pallas/{siddon,joseph}.py) and the trilinear
    ray-march (ops/pallas/raymarch.py). ``p_subsample`` renders the full
    frame on the kernel and gathers the sparse rays (faster than a sparse
    gather render on TPU); ``patch_size`` is a no-op on the kernel path
    (memory is O(1) per ray).  ``force_xla=True`` escapes to the XLA oracles.

Pallas validity note (Siddon): the slab-march kernel is exact only for rays
whose transverse direction components satisfy ``max(|dy|,|dz|) <= |dx|``
along the chosen march axis. Auto-dispatch picks the axis minimizing the
worst-case per-ray ratio; for extreme cone beams (detector half-diagonal
approaching ``sdd``) combined with oblique poses no axis may satisfy it —
use ``DRR.pallas_ray_compatibility(pose)`` to check a pose set, and pass
``force_xla=True`` (or ``renderer="joseph"``, which degrades gracefully)
when it reports violations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from ._precision import f32_matmuls
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

# Cost-model constants, in MXU-MAC units. Used only for *ranking* tile
# choices. Fitted on v5e hardware from the round-4 two-regime tile sweep
# (tools/sweep_tile.py both plain and --volume 512 ->
# tools/fit_cost_model.py; 11 configs, 200^2 detector, 512x512x133
# VMEM-resident CT + 512^3 isotropic streaming CT). The DMA term is now
# real: residency zeroes it inside pallas_cost_terms (one bulk DMA), while
# streaming volumes pay ~3.6k units/byte of per-plane window DMA — the
# round-3 fit could not see this because its single regime was entirely
# resident. Fit residuals <=11% except t64-streaming (17%, never selected);
# the implied ranking (t32 everywhere) matches the measured ordering in
# BOTH regimes.
_COST_VPU_ELEM = 1961.2
_COST_DMA_BYTE = 3614.6
_COST_FIXED_STEP = 7.261e8

# Sparse-dispatch crossover: one XLA-oracle ray costs ~this many kernel
# full-frame rays (per renderer). Joseph FITTED on v5e (round-4 sparse
# sweep, tools/sweep_sparse.py: oracle 14.2 us/ray from the {400, 4k, 10k}
# ray cells vs kernel 0.115 us/ray at 200^2): the oracle only wins below
# ~400 rays at 200^2 — uniform p_subsample occupies nearly every tile, so
# the kernel path renders (near-)full frames and still beats per-ray XLA
# 10-30x at p in [0.1, 0.25] (measured: xla 49.6/142.5 ms vs kernel
# 4.5/4.6 ms at p=0.1/0.25). Siddon/trilinear keep deliberately HIGH
# (conservative) values — their oracles are costlier (sort / 500-sample
# gathers), and overestimating the oracle keeps renders on the kernel
# path, which measurement says is the right default.
_SPARSE_XLA_RAY_COST = {"siddon": 250.0, "joseph": 124.0, "trilinear": 120.0}


def pallas_cost_terms(renderer_name, tile, ky, zw, zc, height, width,
                      storage, resident=False):
    """Raw per-ray-per-plane cost-model components (MAC units).

    Returns (mxu, vpu, dma, fixed, pad): the MXU contraction, tent/one-hot
    VPU builds, window DMA bytes, per-step fixed cost, and the
    detector-padding waste factor. The planner combines them with the
    ``_COST_*`` constants; ``tools/fit_cost_model.py`` fits those constants
    against sweep measurements through THIS function, so the two can never
    desynchronize.

    ``resident``: the volume fits VMEM — kernels do ONE bulk DMA at grid
    step 0 and per-plane reads are VMEM slices, so the per-plane window-DMA
    term vanishes (round 4; previously the term was charged in both
    regimes, which forced the fit to zero it out to explain the resident
    sweep and left the planner blind to streaming DMA).
    """
    TR = tile * tile
    bytes_el = 2 if storage == "bf16" else 4
    n_mm = 2 if renderer_name == "siddon" else 1
    vpu_c = 5.0 if renderer_name == "siddon" else 3.0
    pad = (-(-height // tile) * tile) * (-(-width // tile) * tile)
    pad = pad / float(max(1, height * width))
    mxu = n_mm * ky * zc * max(1.0, 128.0 / TR)
    vpu = vpu_c * (ky + zc) + 2.0 * ky * zw / TR
    dma = 0.0 if resident else ky * zw * bytes_el / TR
    fixed = 1.0 / TR
    return mxu, vpu, dma, fixed, pad


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
        cache_volume: bool = True,
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
        self._density_host = np.asarray(
            np.asarray(subject.density.data), np.float32
        )
        self.density = jnp.asarray(self._density_host)
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

        # --- Pallas static planning (host-side, at construction) ---
        self.pallas_precision = self.renderer_kwargs.pop("precision", "f32")
        # bf16 storage halves the kernel's volume DMA traffic. Under the
        # default precision policy the MXU computes in bf16 regardless, so
        # results are bit-identical — it is a pure win and the default.
        # True-f32 runs (precision="highest") keep f32 storage.
        default_storage = None if self.pallas_precision == "highest" else "bf16"
        self.pallas_storage = self.renderer_kwargs.pop("storage", default_storage)
        # Footprint scale: the static window bound assumes worst-case
        # magnification (samples at the detector plane, alpha = 1).
        # Geometries that keep the volume near the isocenter only reach
        # alpha ~ 0.5-0.7; lowering pallas_fp_scale shrinks windows (and
        # kernel cost — window extents scale both the MXU contraction and
        # the VPU tent builds). Default 0.8: the exact per-pose
        # footprint-fit guard now rides the window-placement scan for free
        # (ops/pallas/joseph.py), so a pose that outgrows the shrunk
        # windows falls back to the XLA oracle instead of clipping —
        # slower for such extreme-magnification poses, never wrong. Set
        # 1.0 to restore the conservative bound (kernel always eligible).
        self._fp_scale = float(self.renderer_kwargs.pop("pallas_fp_scale", 0.8))
        self._tile_override = self.renderer_kwargs.pop("pallas_tile", None)
        self._cache_volume = bool(cache_volume)
        self._plan_pallas()

    # ---------------------------------------------------------- pallas planning
    def _plan_pallas(self) -> None:
        """Plan per-axis kernel windows, tile sizes, march steps, and caches.

        Re-run whenever the detector intrinsics change (``set_intrinsics_``).
        """
        # Host-side affine: slicing the device array would dispatch an eager
        # op over the TPU tunnel (observed multi-minute stalls).
        affine = np.asarray(self.subject.volume.affine, np.float64)
        spacing = np.sqrt((affine[:3, :3] ** 2).sum(axis=0))  # (3,) mm/voxel
        dims = tuple(int(d) for d in self.density.shape)
        pitch = max(self.detector.delx, self.detector.dely)

        # Default march axis: the volume axis most aligned with the principal
        # ray direction at the identity pose. A per-call `axis` kwarg or the
        # runtime worst-ray dispatch overrides.
        reorient_R = np.asarray(self.subject.reorient, np.float64)[:3, :3]
        affine_inv_R = np.linalg.inv(affine)[:3, :3]
        principal = affine_inv_R @ reorient_R @ np.array([0.0, 0.0, 1.0])
        self.march_axis = int(np.argmax(np.abs(principal)))

        # Resolution-matched default march stride for the Joseph renderer:
        # sample every `max(spacing)` mm along any axis, so a lateral march
        # over a finely-spaced axis costs (and resolves) the same as the
        # coarse principal axis (docs/STATUS.md round-1 item 7).
        ref_sp = float(spacing.max())
        self.joseph_steps = tuple(
            max(1, int(round(ref_sp / float(spacing[a])))) for a in range(3)
        )

        def fp(tile, sp):
            return int(np.ceil(tile * pitch / float(sp) * 1.35
                               * self._fp_scale)) + 6

        hpx, wpx = self.detector.height, self.detector.width
        cfgs = []
        for axis in range(3):
            other = [d for d in range(3) if d != axis]
            best = None
            # TR = tile^2 is the kernel block's lane dimension: Mosaic
            # requires it to be a multiple of 128, so tiles below 16 are out.
            # All three candidates are hardware-measured (round-3 sweep);
            # t64 loses at every measured config but stays in the pool for
            # geometries where its window/padding economics differ.
            for tile in (16, 32, 64):
                # +2 placement slack, +15 start-alignment loss, 16-aligned
                # size (covers the bf16 (16, 128) HBM tiling).
                ky = -(-(fp(tile, spacing[other[0]]) + 18) // 16) * 16
                # Compute window (zc) must cover the footprint; the DMA
                # window (zw) additionally absorbs up to 127 lanes of
                # 128-alignment slack, must be a multiple of 128, AND must
                # be a power-of-two multiple of 128 — Mosaic's dynamic
                # lane roll silently miscompiles at widths like 384 on
                # real hardware (_validate_z_window).
                zc = max(64, -(-(fp(tile, spacing[other[1]]) + 2) // 64) * 64)
                zw = 128
                while zw < zc + 127:
                    zw *= 2
                if ky > 256:
                    continue
                # Per-ray-per-plane cost model; components shared with the
                # fit tool via pallas_cost_terms. Residency decided exactly
                # like the dispatch will (_resolve_resident's byte test).
                from .ops.pallas.joseph import (_RESIDENT_BUDGET,
                                                _resident_bytes)

                itm = 2 if self.pallas_storage == "bf16" else 4
                # Blend adds one source plane to the resident footprint;
                # mirror the dispatch's decision (joseph.py: abs(h -
                # round(h)) > 1e-9): trilinear marches at a fractional
                # stride (raymarch.py), joseph at integer default steps,
                # siddon plane-to-plane.
                if self.renderer_name == "trilinear":
                    blend = True
                else:
                    h = (self.joseph_steps[axis]
                         if self.renderer_name == "joseph" else 1)
                    blend = abs(h - round(h)) > 1e-9
                res = _resident_bytes(dims, axis, ky, zw, blend,
                                      itm) <= _RESIDENT_BUDGET
                mxu, vpu, dma, fixed, pad = pallas_cost_terms(
                    self.renderer_name, tile, ky, zw, zc, hpx, wpx,
                    self.pallas_storage, resident=res)
                cost = (mxu + _COST_VPU_ELEM * vpu + _COST_DMA_BYTE * dma
                        + _COST_FIXED_STEP * fixed) * pad
                if best is None or cost < best[0]:
                    best = (cost, tile, ky, zw, zc)
            if best is None:
                cfgs.append(None)  # window cannot fit: no Pallas on this axis
                continue
            _, tile, ky, zw, zc = best
            if self._tile_override is not None:
                tile = int(self._tile_override)
                ky = -(-(fp(tile, spacing[other[0]]) + 18) // 16) * 16
                zc = max(64, -(-(fp(tile, spacing[other[1]]) + 2) // 64) * 64)
                zw = 128
                while zw < zc + 127:
                    zw *= 2
            cfgs.append((tile, ky, zw, zc))
        self.pallas_cfg = tuple(cfgs)
        self.pallas_ok = all(c is not None for c in cfgs)

        # Static cone-beam bound: tan of the largest angle between any
        # detector ray and the principal ray (pose-independent).
        half_w = self.detector.width / 2 * self.detector.delx + abs(self.detector._x0)
        half_h = self.detector.height / 2 * self.detector.dely + abs(self.detector._y0)
        self.cone_tan = float(np.hypot(half_w, half_h) / self.detector.sdd)

        # Per-axis prepped-volume caches (transposed/padded/cast, +1 plane
        # for the fractional-stride trilinear mode). Only materialized on
        # TPU-class backends — the XLA paths don't use them.
        backend = jax.default_backend()
        if (self._cache_volume and self.pallas_ok
                and backend in ("tpu", "axon")):
            # Host-side NumPy prep (transpose/cast/pad) + one device transfer
            # per axis: eager device ops over the TPU tunnel each cost a
            # compile + round trip, so nothing runs on-device here.
            import ml_dtypes

            dens = getattr(self, "_density_host", None)
            if dens is None:
                dens = np.asarray(self.density)
            if self.pallas_storage == "bf16":
                dens = dens.astype(ml_dtypes.bfloat16)
            pvols = []
            for axis in range(3):
                tile, ky, zw, zc = self.pallas_cfg[axis]
                perm3 = (axis,) + tuple(d for d in range(3) if d != axis)
                v = np.transpose(dens, perm3)
                ypad = max(0, ky - v.shape[1])
                # Mirrors _prep_vol: padded Z is >= zw AND 128-aligned (the
                # z-start clamp to Z - zw must stay a multiple of 128).
                zpad = max(zw, -(-v.shape[2] // 128) * 128) - v.shape[2]
                v = np.pad(v, ((0, 1), (0, ypad), (0, zpad)))
                pvols.append(jnp.asarray(v))
            self._pvols = tuple(pvols)
        else:
            self._pvols = (None, None, None)

    # ------------------------------------------------------------------ pytree
    def tree_flatten(self):
        children = (
            self.detector,
            self._affine,
            self._affine_inverse,
            self.density,
            self.mask,
            self._pvols,
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
            self.joseph_steps,
            self.pallas_cfg,
            self.pallas_ok,
            self.pallas_precision,
            self.pallas_storage,
            self.cone_tan,
            self._fp_scale,
            self._tile_override,
            self._cache_volume,
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
            obj._pvols,
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
            obj.joseph_steps,
            obj.pallas_cfg,
            obj.pallas_ok,
            obj.pallas_precision,
            obj.pallas_storage,
            obj.cone_tan,
            obj._fp_scale,
            obj._tile_override,
            obj._cache_volume,
        ) = aux
        obj.subject = subject_static.value
        obj.renderer_kwargs = dict(renderer_kwargs)
        obj._density_host = None  # host copy not tracked through transforms
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
        return max(
            1, (self.detector.height * self.detector.width) // (self.patch_size**2)
        )

    @property
    def dtype(self):
        return self.density.dtype

    def set_density(self, density: jnp.ndarray) -> None:
        """Replace the stored density and refresh the kernel volume caches."""
        self._density_host = np.asarray(density, np.float32)
        self.density = jnp.asarray(self._density_host)
        self._plan_pallas()

    def pallas_ray_compatibility(self, pose: RigidTransform):
        """(best_axis, worst_ratio) for the exact-Siddon Pallas kernel.

        ``worst_ratio`` is ``max over rays of max(|d_t|) / |d_axis|`` at the
        best axis; values > 1 mean some rays violate the slab-march
        assumption and the kernel's integrals are inexact for them — pass
        ``force_xla=True`` (or use ``renderer="joseph"``). Host helper;
        call outside jit.
        """
        source, target = self.detector(pose, None)
        if self.detector.n_subsample is not None:
            # The kernels always render the FULL plane; probing only the
            # sampled subset would understate the worst ray.
            target = self.detector.full_plane_target(pose, None)
        sv = self.affine_inverse(source)
        tv = self.affine_inverse(target)
        d = np.abs(np.asarray(tv - sv))  # (B, N, 3)
        ratios = []
        for axis in range(3):
            other = [a for a in range(3) if a != axis]
            r = np.max(np.maximum(d[..., other[0]], d[..., other[1]])
                       / np.maximum(d[..., axis], 1e-12))
            ratios.append(r)
        best = int(np.argmin(ratios))
        return best, float(ratios[best])

    def diagnose_pose(self, pose: RigidTransform) -> dict:
        """Explain how the Pallas dispatch would treat a pose. Host helper.

        The runtime guards route invalid-for-the-kernel poses to XLA
        fallbacks inside ``lax.cond`` — invisible from outside jit except
        as a performance cliff. This reports, per march axis: the
        worst-ray slab ratio (exact-Siddon validity, > 1 means fallback
        when guarded) and whether the pose's tile footprints fit the
        planned windows (``pallas_fp_scale`` headroom; False means the
        footprint guard would fall back).
        """
        from .ops.pallas.joseph import footprint_fits

        source, target = self.detector(pose, None)
        if self.detector.n_subsample is not None:
            # The kernels (and their guards) always see the FULL detector
            # plane; probing the subsampled rays would tile garbage (the
            # full-frame tile permutation gathers past the subsampled count).
            target = self.detector.full_plane_target(pose, None)
        sv = self.affine_inverse(source)
        tv = self.affine_inverse(target)
        d = np.abs(np.asarray(tv - sv))
        H, W = self.detector.height, self.detector.width
        weights = jnp.ones((target.shape[0], 1, target.shape[1]), jnp.float32)
        ratios, fits = [], []
        for axis in range(3):
            other = [a for a in range(3) if a != axis]
            ratios.append(float(np.max(
                np.maximum(d[..., other[0]], d[..., other[1]])
                / np.maximum(d[..., axis], 1e-12))))
            cfg = self.pallas_cfg[axis]
            if cfg is None:
                fits.append(False)
                continue
            tile, ky, zw, zc = cfg
            fits.append(bool(footprint_fits(
                sv, tv, weights, dims=self.density.shape,
                image_shape=(H, W), axis=axis, tile=tile, ky=ky, zw=zw,
                zc=zc, voxel_shift=self.voxel_shift,
                quadrature=("siddon" if self.renderer_name == "siddon"
                            else "joseph"),
            )))
        best = int(np.argmin(ratios))
        return {
            "best_axis": best,
            "worst_ratio": ratios,
            "footprint_fits": fits,
            "pallas_ok": self.pallas_ok,
            "slab_valid": ratios[best] <= 1.0 + 1e-6,
            "fp_guard_active": self._fp_scale < 1.0,
            # Pose-independent cone-beam bound: tan of the widest angle any
            # detector ray makes with the principal ray. > 1 means NO pose
            # can satisfy the exact-Siddon slab-validity guard (the geometry
            # itself is too wide) — the kernel path will always fall back.
            "cone_tan": self.cone_tan,
        }

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

        # Sparse rendering on the kernel path (reference: only the sampled
        # rays are ever rendered, detector.py:134-137). Three strategies,
        # chosen statically by the cost model (_sparse_strategy):
        #   "tiles" — render only the detector tiles containing sampled rays
        #             (kernel grid shrinks to the occupied tiles), gather;
        #   "full"  — render the full frame and gather (every tile occupied:
        #             at uniform sampling, p * tile^2 >~ 3 fills all tiles);
        #   "xla"   — very sparse: the XLA oracle renders ONLY the sampled
        #             rays (cost scales with n_subsample, not the frame).
        sparse_idx = None
        # Capability must be judged on the SAME option set render() will see:
        # constructor renderer_kwargs merged with per-call kwargs. Judging
        # per-call kwargs alone would route a disqualified config (e.g.
        # mode="bilinear" set at construction) through the full-frame swap
        # and then into an unchunked XLA render of every ray.
        if (self.detector.n_subsample is not None
                and self._pallas_capable(
                    mask_to_channels, {**self.renderer_kwargs, **kwargs})):
            strategy, subsets = self._sparse_strategy()
            if strategy != "xla":
                full_target = self.detector.full_plane_target(pose, calibration)
                sparse_idx = jnp.asarray(self.detector.subsamples[-1],
                                         jnp.int32)
                target = full_target
                if strategy == "tiles":
                    kwargs["_tile_subsets"] = subsets

        render = self.render
        if self.checkpoint_gradients:
            # _density_is_stored: inside jax.checkpoint the density argument
            # is a fresh tracer, so render's `density is self.density` cache
            # test would always fail and the prepped-volume cache would be
            # silently bypassed (full re-transpose/pad/cast per forward AND
            # per backward rematerialization). The identity is known here.
            render = jax.checkpoint(
                partial(self.render, mask_to_channels=mask_to_channels,
                        _density_is_stored=True, **kwargs)
            )
            img = render(self.density, source, target)
        else:
            img = render(
                self.density, source, target, mask_to_channels=mask_to_channels,
                **kwargs,
            )
        if sparse_idx is not None:
            img = img[:, :, sparse_idx]
        return self.reshape_transform(img, batch_size=len(pose))

    def _sparse_strategy(self):
        """Pick the sparse-render strategy + per-axis tile subsets (static).

        Returns ``(strategy, subsets)`` where strategy is "tiles" / "full" /
        "xla" and subsets is a per-axis tuple of occupied-tile indices (None
        where an axis's tiles are all occupied). Host-side, trace-time only.
        """
        idx = np.asarray(self.detector.subsamples[-1], np.int64)
        H, W = self.detector.height, self.detector.width
        subsets, kernel_rays = [], []
        for ax in range(3):
            cfg = self.pallas_cfg[ax]
            if cfg is None:
                subsets.append(None)
                continue
            tile = cfg[0]
            th, tw = -(-H // tile), -(-W // tile)
            t = np.unique((idx // W) // tile * tw + (idx % W) // tile)
            full = len(t) == th * tw
            subsets.append(None if full else tuple(int(x) for x in t))
            kernel_rays.append(len(t) * tile * tile)
        subsets = tuple(subsets)
        if not kernel_rays:  # no kernel axis; caller won't use the result
            return "full", subsets
        # Very sparse: the XLA oracle renders ONLY the sampled rays, costing
        # ~_SPARSE_XLA_RAY_COST kernel-ray-equivalents each (per renderer;
        # conservative pre-fit values — overestimating the oracle just keeps
        # the kernel, never a regression).
        n_sub = len(idx)
        if (n_sub * _SPARSE_XLA_RAY_COST[self.renderer_name]
                < min(kernel_rays)):
            return "xla", subsets
        if all(s is None for s in subsets):
            return "full", subsets
        return "tiles", subsets

    def _pallas_capable(self, mask_to_channels: bool, opts: dict) -> bool:
        """Static part of the Pallas dispatch decision."""
        if not self.pallas_ok or jax.default_backend() not in ("tpu", "axon"):
            return False
        if opts.get("force_xla", False):
            return False
        if mask_to_channels and (
            self.renderer_name == "siddon" or self.mask is None
        ):
            # Per-structure channels run in-kernel for joseph/trilinear;
            # exact Siddon with channels stays on the XLA oracle.
            return False
        if self.renderer_name == "siddon":
            # "max" (MIP) runs fully in-kernel: the forward tracks each
            # ray's argmax (slab, segment) and the analytic backward
            # kernels gate on it (max's subgradient).
            return (
                opts.get("mode", "nearest") == "nearest"
                and opts.get("reducefn", "sum") in ("sum", "max")
                and not opts.get("align_corners", False)
            )
        if self.renderer_name == "trilinear":
            # reducefn="max" stays on the XLA oracle: the kernel's
            # plane-aligned samples carry different per-ray quadrature
            # weights than the oracle's global equispaced step, so their
            # weighted maxima differ (sums converge, maxima don't).
            return (
                opts.get("mode", "trilinear") == "trilinear"
                and opts.get("reducefn", "sum") == "sum"
                and not opts.get("align_corners", False)
                and opts.get("alphamin") is None
                and opts.get("alphamax") is None
            )
        if self.renderer_name == "joseph":
            # "max" (MIP) runs fully in-kernel (argmax-gated analytic
            # backward, ops/pallas/joseph.py).
            return opts.get("reducefn", "sum") in ("sum", "max")
        return False

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
        density_is_stored = opts.pop("_density_is_stored", False)
        # Per-axis occupied-tile subsets (sparse rendering, set by forward's
        # "tiles" strategy). The guard fallback still renders the full frame
        # — correct (extra rays are discarded by the sparse gather), and the
        # guard only trips for extreme poses.
        tile_subsets = opts.pop("_tile_subsets", None)
        opts["voxel_shift"] = self.voxel_shift
        if mask_to_channels:
            opts["mask"] = self.mask
            opts["n_channels"] = self.n_channels

        # Pallas fast paths: full-frame kernel renders on TPU. The detector
        # shape must match the ray count (full-frame rays in row-major
        # order); `forward` guarantees this, direct `render` callers with
        # subsampled rays fall back to XLA.
        H, W = self.detector.height, self.detector.width
        use_pallas = (
            self._pallas_capable(mask_to_channels, opts)
            and target.shape[1] == H * W
        )
        opts.pop("force_xla", None)

        if use_pallas and self.renderer_name == "siddon" and opts.pop(
            "stop_gradients_through_grid_sample", False
        ):
            # Nearest sampling already has zero value-gradients w.r.t.
            # pose; this additionally blocks the density path.
            density = jax.lax.stop_gradient(density)

        if use_pallas:
            # March axis: static if the caller pinned one, otherwise selected
            # at runtime by the worst-ray alignment criterion via lax.switch
            # over the three axis-specialized renders (jit-safe pose
            # dependence; minimizes the Siddon slab-validity violation and
            # the Joseph quadrature skew).
            axis = opts.pop("axis", None)
            step = opts.pop("step", None)
            n_points = opts.pop("n_points", 500)
            allow_oversample = opts.pop("allow_oversample", False)
            resident = opts.pop("resident", None)
            reducefn = opts.pop("reducefn", "sum")
            eps = opts.pop("eps", 1e-8)
            # Fused value+gradient forward under AD (ops/pallas/joseph
            # _fwdgrad_kernel): the right default for pose-gradient
            # workloads (registration); pass False when differentiating
            # ONLY the density (reconstruction) — there the fused rows are
            # dead weight (~2x forward-kernel cost) and the lean forward
            # wins. make_reconstruction_step does this automatically.
            fused_pose_bwd = opts.pop("fused_pose_bwd", True)
            if (self.renderer_name == "trilinear"
                    and not allow_oversample
                    and n_points > self.density.shape[
                        axis if axis is not None else self.march_axis]):
                import warnings

                warnings.warn(
                    f"trilinear kernel caps n_points={n_points} at one "
                    f"sample per plane "
                    f"({self.density.shape[axis if axis is not None else self.march_axis]}); "
                    f"accuracy is already saturated there — pass "
                    f"allow_oversample=True to honor n_points literally "
                    f"(reference semantics, proportionally slower)",
                    stacklevel=3,
                )
            # Reject anything left over beyond the keys the capability gate
            # validated: on the XLA path a typo'd kwarg raises a TypeError
            # from the renderer, and the kernel path must not silently
            # swallow the same mistake.
            known_leftover = {"voxel_shift", "mask", "n_channels", "mode",
                              "align_corners", "alphamin", "alphamax",
                              "slab_guard", "footprint_guard",
                              "stop_gradients_through_grid_sample"}
            unknown = set(opts) - known_leftover
            if unknown:
                raise TypeError(
                    f"unexpected renderer option(s) {sorted(unknown)} for "
                    f"the {self.renderer_name!r} kernel path"
                )
            # Use the cached prepped volume only for the stored density (the
            # reconstruction seam passes a free variable — never cached).
            # Identity fails under jax.checkpoint (the arg is re-traced);
            # forward passes the known answer via _density_is_stored.
            cached = density_is_stored or density is self.density

            slab_guard = opts.pop("slab_guard", True)
            guarded = self.renderer_name == "siddon" and slab_guard
            # Footprint guard: static windows are sized for a conservative
            # worst-case magnification; a pose that exceeds them (volume
            # pushed past the detector, strongly oblique rays with an
            # explicit axis, or an aggressive pallas_fp_scale) would
            # silently clip peripheral samples. The exact per-(tile, plane)
            # fit bit is computed inside the SAME plane scan that places
            # the kernel windows (zero extra passes), so the guard is free
            # and defaults ON; failing poses render through the XLA oracle
            # fallback instead.
            fp_guard = opts.pop("footprint_guard", None)
            if fp_guard is None:
                fp_guard = True

            def xla_fallback(density, source, target, weights):
                # Slab-validity escape for exact Siddon: a ray whose
                # transverse/axial slope exceeds 1 at the march axis can
                # cross two transverse voxel boundaries inside one slab,
                # which the rank-2 slab decomposition cannot represent —
                # its integral would be silently wrong. Render such poses
                # on the sort-based XLA oracle instead (exact, slower).
                # The footprint guard reuses this escape for all renderers.
                #
                # lax.cond sizes its allocation at the max over branches, so
                # this branch must stay memory-bounded even when never taken:
                # the sort-based oracle materializes (B, N, ~sum(dims))
                # intersection buffers, which at 1000^2 rays would be tens of
                # GB. Chunk rays through lax.map with a fixed chunk size.
                xopts = {k: v for k, v in opts.items()
                         if k not in ("axis", "step", "n_points",
                                      "allow_oversample", "resident")}
                # reducefn/eps were popped for the kernel call; the fallback
                # must honor them too (a guard-triggered MIP would otherwise
                # silently render the line integral).
                xopts["reducefn"] = reducefn
                xopts["eps"] = eps
                if self.renderer_name == "trilinear":
                    xopts["n_points"] = n_points
                # Rematerialize: the oracle's sort/take_along_axis saves u32
                # gather-index residuals whose trailing unit dim lane-pads
                # x128 under TPU (8,128) tiling; stacked across lax.map
                # chunks by the backward scan they reach tens of GB. With
                # remat the backward recomputes each chunk instead.
                if self.renderer_name == "joseph":
                    def jfb(ax_s):
                        st = (step if step is not None
                              else self.joseph_steps[ax_s])
                        return partial(_RENDERERS["joseph"], axis=ax_s,
                                       step=st, **xopts)

                    if axis is not None:
                        base = jfb(axis)
                    else:
                        d = jnp.mean(target - source, axis=(0, 1))
                        jidx = jnp.argmax(jnp.abs(d))

                        def base(*args):
                            return jax.lax.switch(
                                jidx, [jfb(a) for a in range(3)], *args)
                else:
                    base = partial(_RENDERERS[self.renderer_name], **xopts)
                fallback = jax.checkpoint(
                    base,
                    policy=jax.checkpoint_policies.nothing_saveable,
                )
                N = target.shape[1]
                chunk = 16384
                if N <= chunk:
                    return fallback(density, source, target, weights)
                n_chunks = -(-N // chunk)
                pad = n_chunks * chunk - N
                tgt = jnp.pad(target, ((0, 0), (0, pad), (0, 0)), mode="edge")
                wgt = jnp.pad(weights, ((0, 0), (0, 0), (0, pad)), mode="edge")
                tgt = tgt.reshape(target.shape[0], n_chunks, chunk, 3)
                wgt = wgt.reshape(weights.shape[0], weights.shape[1],
                                  n_chunks, chunk)
                out = jax.lax.map(
                    lambda tw: fallback(density, source, tw[0], tw[1]),
                    (jnp.moveaxis(tgt, 1, 0), jnp.moveaxis(wgt, 2, 0)),
                )  # (n_chunks, B, C, chunk)
                out = jnp.moveaxis(out, 0, 2)  # (B, C, n_chunks, chunk)
                return out.reshape(*out.shape[:2], n_chunks * chunk)[..., :N]

            def worst_ratios():
                # Worst-ray alignment ratio per axis (voxel space), from the
                # FOUR CORNER rays only — exact, not a heuristic: rays are
                # affine in detector pixel coords (every transform in the
                # chain is affine), so each |d_transverse|/|d_axis| is a
                # linear-fractional function of (u, v); on the detector
                # rectangle its max is attained at a vertex whenever d_axis
                # has uniform sign there, and a sign change among the
                # corners (affine d_axis ⇒ extremes at corners) means some
                # interior ray has d_axis ≈ 0, i.e. the axis is invalid.
                # Replaces a full-frame (B, N) max-reduce with an O(4B) one.
                W_ = self.detector.width
                cidx = jnp.asarray(
                    [0, W_ - 1, (H - 1) * W_, H * W_ - 1], jnp.int32)
                d = target[:, cidx] - jnp.broadcast_to(
                    source, target.shape)[:, cidx]  # (B, 4, 3)
                da = jnp.abs(d)
                eps = 1e-12
                same_sign = (jnp.max(d, axis=1) * jnp.min(d, axis=1)
                             ) > 0.0  # (B, 3): uniform d sign per axis
                trans_max = jnp.stack([
                    jnp.maximum(da[..., 1], da[..., 2]),
                    jnp.maximum(da[..., 0], da[..., 2]),
                    jnp.maximum(da[..., 0], da[..., 1]),
                ], axis=-1)  # (B, 4, 3)
                r = jnp.max(trans_max / jnp.maximum(da, eps), axis=1)  # (B, 3)
                r = jnp.where(same_sign, r, 1e12)
                return jnp.max(r, axis=0)  # (3,)

            ratios = worst_ratios() if (guarded or axis is None) else None

            def render_axis(ax):
                tile, ky, zw, zc = self.pallas_cfg[ax]
                common = dict(
                    image_shape=(H, W),
                    voxel_shift=self.voxel_shift,
                    eps=eps,
                    tile=tile, ky=ky, zw=zw, zc=zc,
                    precision=self.pallas_precision,
                    storage=self.pallas_storage,
                    prepped_vol=self._pvols[ax] if cached else None,
                    resident=resident,
                    footprint_guard=fp_guard,
                    guard_pred=(ratios[ax] <= 1.0 + 1e-6) if guarded
                    else None,
                    fallback=(xla_fallback if (fp_guard or guarded)
                              else None),
                    tile_subset=(tile_subsets[ax] if tile_subsets is not None
                                 else None),
                    fused_pose_bwd=fused_pose_bwd,
                )
                if mask_to_channels:
                    common["mask"] = self.mask
                    common["n_channels"] = self.n_channels
                if self.renderer_name == "joseph":
                    from .ops.pallas.joseph import joseph_pallas_raycast

                    ax_step = step if step is not None else self.joseph_steps[ax]
                    return partial(joseph_pallas_raycast, axis=ax,
                                   step=ax_step, reducefn=reducefn, **common)
                if self.renderer_name == "trilinear":
                    from .ops.pallas.raymarch import raymarch_pallas_raycast

                    return partial(raymarch_pallas_raycast, axis=ax,
                                   n_points=n_points,
                                   allow_oversample=allow_oversample,
                                   reducefn=reducefn, **common)
                from .ops.pallas.siddon import siddon_pallas_raycast

                return partial(siddon_pallas_raycast, axis=ax,
                               reducefn=reducefn, **common)

            if axis is not None:
                return render_axis(axis)(density, source, target, weights)
            # Pick the axis minimizing the worst-ray ratio (the safest choice
            # for the Siddon slab-validity bound and the Joseph quadrature
            # skew). Each branch carries its own guard + fallback.
            idx = jnp.argmin(ratios)
            return jax.lax.switch(
                idx, [render_axis(a) for a in range(3)],
                density, source, target, weights,
            )

        # Pallas-only hints are dropped on the XLA paths.
        opts.pop("allow_oversample", None)
        opts.pop("slab_guard", None)
        opts.pop("footprint_guard", None)
        opts.pop("resident", None)
        opts.pop("fused_pose_bwd", None)
        if self.renderer_name != "trilinear":
            opts.pop("n_points", None)
        if self.renderer_name in ("siddon", "trilinear"):
            # Pallas march-axis hints; the XLA oracles sample along the ray
            # (siddon sorts crossings, trilinear equispaces), axis-free.
            opts.pop("axis", None)
            opts.pop("step", None)
        if self.renderer_name == "joseph":
            axis = opts.pop("axis", None)
            step = opts.pop("step", None)
            if axis is None:
                # Auto axis from the FULL ray bundle, then render through the
                # common path below so patch_size chunking still applies
                # (an early return here used to bypass the patch loop).
                d = jnp.mean(target - source, axis=(0, 1))
                idx = jnp.argmax(jnp.abs(d))
                base = renderer

                def renderer(density, source, t, w, **o):
                    return jax.lax.switch(
                        idx,
                        [partial(
                            base, axis=a,
                            step=(step if step is not None
                                  else self.joseph_steps[a]),
                            **o) for a in range(3)],
                        density, source, t, w,
                    )
            else:
                opts["axis"] = axis
                opts["step"] = (step if step is not None
                                else self.joseph_steps[axis])
        if self.patch_size is None:
            return renderer(density, source, target, weights, **opts)

        # Patch-wise chunked rendering (reference: drr.py:217-225). Tolerant
        # of detector sizes not divisible by the patch count (like torch
        # .chunk): the last chunk is smaller.
        n = self.n_patches
        N = target.shape[1]
        size = -(-N // n)
        partials = []
        for i in range(0, N, size):
            t = target[:, i : i + size]
            w = weights[..., i : i + size]
            partials.append(renderer(density, source, t, w, **opts))
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
            x0 if x0 is not None else self.detector._x0,
            y0 if y0 is not None else self.detector._y0,
            self.detector._reorient,
            n_subsample if n_subsample is not None else self.detector.n_subsample,
            reverse_x_axis
            if reverse_x_axis is not None
            else self.detector.reverse_x_axis,
        )
        # Window sizes depend on the pixel pitch: re-plan.
        self._plan_pallas()

    def rescale_detector_(self, scale: float) -> None:
        """Rescale the detector plane in place (reference: drr.py:258-266)."""
        self.set_intrinsics_(
            height=int(self.detector.height * scale),
            width=int(self.detector.width * scale),
            delx=float(self.detector.delx / scale),
            dely=float(self.detector.dely / scale),
        )

    # ------------------------------------------------------------- projections
    @f32_matmuls
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

    @f32_matmuls
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
    C = img.shape[1]  # 1, or n_channels under mask_to_channels
    drr = jnp.zeros((batch_size, C, n_points), img.dtype)
    idx = jnp.asarray(detector.subsamples[-1], jnp.int32)
    drr = drr.at[:, :, idx].set(img.reshape(batch_size, C, -1))
    return drr.reshape(batch_size, C, detector.height, detector.width)
