"""Pallas TPU kernels: Joseph plane-marching DRR renderer, forward + backward.

The TPU-native replacement for the reference's grid_sample+sort hot path
(SURVEY §2, §7). Algorithm (see diffdrr_tpu/ops/joseph.py for the XLA
reference implementation): march the volume's major axis plane by plane; at
plane k each ray contributes ``bilinear(plane_k, y_k, z_k) * dalpha * L``.

Kernel strategy — **no gathers anywhere**:

  * Rays are grouped into square detector tiles (TR rays). At plane k, the
    tile's samples live in a (KY, ZW) window of the plane, DMA'd HBM -> VMEM
    with double buffering. Window starts are precomputed in XLA (min-reduce
    over the tile), aligned to the HBM (8, 128) tile grid, and read from SMEM.
  * In-plane bilinear interpolation factors into two tent-weight
    contractions. The z-contraction runs on the MXU:
        T1 (KY, TR) = window (KY, ZW) @ WzT (ZW, TR)
    with the per-ray quadrature scale folded into WzT. The y-contraction is
    a VPU multiply-reduce against WyT (KY, TR).
  * Per-ray scalars (alpha, y, z, slab mask) live in (1, TR) lane-major
    layout so every VPU op is full-width.
  * Each tile marches only its active plane interval [lo, hi) — planes where
    no ray intersects the volume are skipped entirely (dynamic fori bounds
    from an SMEM range table).
  * Fractional marching (``h`` not an integer, ``blend=True``): samples lie
    at axis position ``p * h``; the window DMA fetches the two bracketing
    planes and the kernel lerps them with the (shared, per-step) fraction
    before the tent contractions — this is the production ``trilinear``
    renderer's sampling mode (see ops/pallas/raymarch.py).

Backward (analytic, per BASELINE.json north star): two additional kernels
with the same loop structure —

  * ``_bwd_rays``: d(out)/d(ray params) via tent-weight derivatives; two
    MXU contractions per plane (T1 and T2 = window^T-contraction) feed VPU
    chain rules accumulated per ray. Produces the pose/weights gradients.
  * ``_bwd_vol``: d(out)/d(volume) via the transposed tent contraction
    dWin = (Wy*g) @ Wz^T per (tile, plane), accumulated into the gradient
    volume with read-modify-write DMA (windows of distinct planes are
    disjoint; the grid is sequential, so RMW is race-free). In blend mode
    adjacent plane-pair windows overlap, so the RMW pipeline serializes.

The two backward kernels are independent pallas_calls, so XLA dead-code
eliminates the volume-gradient pass in pose-only registration loops. The
forward pass saves ``(vol, rays, starts)`` as VJP residuals — backward never
re-runs the (expensive) window-start precompute.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["joseph_pallas_raycast", "plan_tiles"]

# Packed per-ray row indices (first axis of the rays array).
_A = 0  # 1 / d_axis
_B = 1  # -gs_axis / d_axis        (alpha_k = k * A + B)
_GY = 2  # gs along window axis A ("y")
_DY = 3  # d  along window axis A
_GZ = 4  # gs along window axis B ("z")
_DZ = 5  # d  along window axis B
_SC = 6  # weight * |1/d_axis| * step  (full quadrature scale)
_AMIN = 7
_AMAX = 8
_NROWS = 16  # padded for sublane alignment




def _tent(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _tent_d(u):
    """d/du max(0, 1-|u|): -sign(u) on |u|<1 (subgradient 0 at kinks)."""
    return jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0)


def _ray_rows(rays_ref):
    return {
        "a": rays_ref[_A : _A + 1, :],
        "b": rays_ref[_B : _B + 1, :],
        "gy": rays_ref[_GY : _GY + 1, :],
        "dy": rays_ref[_DY : _DY + 1, :],
        "gz": rays_ref[_GZ : _GZ + 1, :],
        "dz": rays_ref[_DZ : _DZ + 1, :],
        "sc": rays_ref[_SC : _SC + 1, :],
        "amin": rays_ref[_AMIN : _AMIN + 1, :],
        "amax": rays_ref[_AMAX : _AMAX + 1, :],
    }


def _plane_geometry(r, p, h, starts_ref):
    """Per-plane per-ray geometry shared by all three kernels.

    ``rz`` is relative to the *true* (unaligned) window start: the aligned DMA
    window is rotated by ``zshift`` lanes in the kernel so the compute window
    starts at the true position (see ``_roll_window``).
    """
    k = p.astype(jnp.float32) * h
    alpha = k * r["a"] + r["b"]  # (1, TR)
    inslab = jnp.logical_and(alpha >= r["amin"], alpha <= r["amax"])
    scale = jnp.where(inslab, r["sc"], 0.0)
    y = r["gy"] + alpha * r["dy"]
    z = r["gz"] + alpha * r["dz"]
    ys = starts_ref[0, p, 0].astype(jnp.float32)
    zs = (starts_ref[0, p, 1] + starts_ref[0, p, 2]).astype(jnp.float32)
    return k, alpha, inslab, scale, y - ys, z - zs


def _dot(a, b, dims, precision):
    """MXU contraction with an explicit precision policy.

    On TPU, float32 matmuls default to single-pass bf16 compute with f32
    accumulation (XLA's DEFAULT precision) — "f32" and "bf16" therefore give
    bit-identical results and differ only in operand-conversion overhead.
    "highest" forces true f32 multiplication (multi-pass, ~3x slower matmul)
    for strict parity against the CPU reference renderers.

    Mixed inputs (a bf16-stored volume window against f32 weights) are
    unified to bf16 — matching what the DEFAULT policy computes anyway.
    """
    if precision == "highest":
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    elif precision == "bf16" or jnp.bfloat16 in (a.dtype, b.dtype):
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    # Explicit Precision.DEFAULT (not None): None would inherit the ambient
    # jax.default_matmul_precision, and the geometry chain around the
    # kernels deliberately runs under a "highest" context (_precision.py) —
    # inheriting it here would silently force 3x-slower f32 MXU passes.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=prec
    )


def _validate_z_window(volume_shape, axis, zw, zc):
    """Reject z-window configs that cannot cover the rolled compute window.

    The DMA window starts at a 128-aligned ``zal`` with the true start
    ``zshift in [0, 127]`` lanes further in, and the compute window is
    ``win[zshift : zshift + zc]`` — so ``zc + 127 <= zw`` is required for
    every possible alignment. The one exception: a window covering the whole
    padded extent, where the start clamp forces ``zshift == 0`` (then
    ``zc == zw`` is fine). Anything else silently samples rolled-in garbage
    lanes (measured 43% error at zw=zc=128 on a 320-extent volume).

    Additionally, whenever a dynamic lane roll runs (``zc != zw``), ``zw``
    must be a POWER-OF-TWO multiple of 128: Mosaic's dynamic
    ``pltpu.roll`` silently miscompiles on non-power-of-two lane counts on
    real v5e hardware (measured: every nonzero shift wrong at width 384,
    exact at 256/512; interpret mode hides it).
    """
    other = tuple(d for d in range(3) if d != axis)
    Zp = max(zw, -(-volume_shape[other[1]] // 128) * 128)
    # zw >= Zp: the DMA window spans the whole padded extent, the start
    # clamps to 0, and zshift + zc <= (Zp - zc) + zc <= zw — any zc is safe.
    if not (zc + 127 <= zw or zw >= Zp):
        raise ValueError(
            f"invalid z windows zc={zc}, zw={zw} for transverse extent "
            f"{volume_shape[other[1]]} (padded {Zp}): need zc + 127 <= zw "
            f"(roll headroom) or zw >= the padded extent"
        )
    lanes = zw // 128
    if zc != zw and (lanes & (lanes - 1)) != 0:
        raise ValueError(
            f"zw={zw} needs a dynamic lane roll (zc={zc} != zw) but is not "
            f"a power-of-two multiple of 128; Mosaic's dynamic roll "
            f"miscompiles silently at such widths on TPU hardware"
        )


def _roll_window(win, zshift, zc):
    """Rotate the aligned (KY, ZW) window so the true z-start is lane 0, then
    keep the first ``zc`` lanes — shrinks the MXU contraction from ZW (which
    carries up to 127 lanes of DMA-alignment slack) down to the footprint."""
    zw = win.shape[-1]
    if zc == zw:
        return win
    if win.dtype != jnp.float32:
        # Mosaic's dynamic rotate requires 32-bit lanes; bf16-stored windows
        # are upcast first (the DMA-traffic saving is already banked).
        win = win.astype(jnp.float32)
    rolled = pltpu.roll(win, -zshift, axis=win.ndim - 1)
    return rolled[..., :zc]


def _plane_index(p, h, n_src_planes, blend):
    """Leading-axis DMA start for marching step ``p`` (static ``h``)."""
    if not blend:
        return p * int(round(h))
    k0 = jnp.floor(p.astype(jnp.float32) * h).astype(jnp.int32)
    return jnp.clip(k0, 0, max(0, n_src_planes - 2))


def _make_window_dma(vol_ref, starts_ref, win_buf, sems, h, ky, zw,
                     blend=False):
    xp = 2 if blend else 1
    n_src = vol_ref.shape[0]

    def window_dma(slot, plane_idx):
        k = _plane_index(plane_idx, h, n_src, blend)
        # Starts are pre-aligned to the HBM (8, 128) tile grid in the XLA
        # precompute; the hints let Mosaic prove slice legality.
        ys = pl.multiple_of(starts_ref[0, plane_idx, 0], 16)
        zs = pl.multiple_of(starts_ref[0, plane_idx, 1], 128)
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(k, xp), pl.ds(ys, ky), pl.ds(zs, zw)],
            win_buf.at[slot],
            sems.at[slot],
        )

    return window_dma


def _blend_fraction(p, h, n_src_planes):
    kf = p.astype(jnp.float32) * h
    k0 = _plane_index(p, h, n_src_planes, True).astype(jnp.float32)
    return kf - k0


def _blend_win(w, p, h, n_src_planes, blend):
    """Reduce a raw (1|2, KY, ZW) window to (KY, ZW), lerping in blend mode."""
    if not blend:
        return w[0]
    fx = _blend_fraction(p, h, n_src_planes)
    w = w.astype(jnp.float32)
    return w[0] * (1.0 - fx) + w[1] * fx


# Streaming-window prefetch depth (reader pipelines only; the RMW backward
# keeps its 2-slot store-wait discipline). Env override for A/B sweeps.
_DMA_SLOTS = int(os.environ.get("DIFFDRR_TPU_DMA_SLOTS", "4"))

# Rolled plane-pair cache for sub-plane (literal) marching. Default OFF:
# hardware A/B (tools/probe_r5.py, round 5) measured the cached path at
# 16.46 ms vs 9.60 ms without it at the literal n=500 config — the
# pl.when-predicated scratch refresh costs more than the per-step
# roll+blend it saves (interpret-mode parity holds either way, which is
# why the regression shipped). Kept behind the env flag for future
# Mosaic-version A/Bs.
_PAIR_CACHE = os.environ.get("DIFFDRR_TPU_PAIR_CACHE", "0") == "1"


def _window_reader(vol_ref, starts_ref, win_buf, sems, h, ky, zw, blend,
                   resident):
    """Unified per-plane window access for the march kernels.

    Non-resident: ``_DMA_SLOTS``-deep prefetch pipeline of HBM->VMEM window
    DMAs (``win_buf`` is (slots, xp, ky, zw) scratch). Two slots only cover
    one compute step of DMA latency; the streaming 512^3 regime showed the
    issue-to-complete latency of the small (64-256 KB) per-plane windows
    exceeding a step, so the reader keeps ``slots - 1`` windows in flight
    (VERDICT r4 weak #4). Resident: ONE whole-volume DMA into a VMEM
    scratch the size of the volume at grid step 0 (the scratch persists
    across the sequential tile grid), after which every (tile, plane) read is
    a VMEM dynamic slice — no per-plane DMA, no re-fetch of overlapping
    windows (measured ~2x kernel speedup at 200^2 on v5e, ~15x less traffic).

    Returns ``(init, prefetch, fetch)``:
      * ``init(lo, hi)`` — issue the initial transfer(s).
      * ``prefetch(_, p_next, hi)`` — called once per marching step with
        ``p_next = p + 1``; issues the DMA for plane ``p + slots - 1`` (the
        deepest pipeline position). The first (slot) argument is ignored —
        slot assignment is the reader's business now (kept for caller
        compatibility; no-op when resident).
      * ``fetch(_, p) -> (xp, ky, zw)`` raw window (blocks on the DMA in
        non-resident mode; callers blend/select planes via ``_blend_win``).
    """
    xp = 2 if blend else 1
    n_src = vol_ref.shape[0]

    if resident:
        def init(lo, hi):
            @pl.when(pl.program_id(0) == 0)
            def _():
                cp = pltpu.make_async_copy(vol_ref, win_buf, sems.at[0])
                cp.start()
                cp.wait()

        def prefetch(slot, p, hi):
            pass

        def fetch(slot, p):
            k = _plane_index(p, h, n_src, blend)
            ys = pl.multiple_of(starts_ref[0, p, 0], 16)
            zs = pl.multiple_of(starts_ref[0, p, 1], 128)
            return win_buf[pl.ds(k, xp), pl.ds(ys, ky), pl.ds(zs, zw)]

        return init, prefetch, fetch

    window_dma = _make_window_dma(vol_ref, starts_ref, win_buf, sems, h, ky,
                                  zw, blend)
    slots = win_buf.shape[0]

    def _slot(p):
        return jax.lax.rem(p, slots)

    def init(lo, hi):
        for s in range(slots - 1):
            @pl.when(lo + s < hi)
            def _(s=s):
                window_dma(_slot(lo + s), lo + s).start()

    def prefetch(_, p_next, hi):
        tgt = p_next + (slots - 2)
        @pl.when(tgt < hi)
        def _():
            window_dma(_slot(tgt), tgt).start()

    def fetch(_, p):
        window_dma(_slot(p), p).wait()
        return win_buf[_slot(p)]

    return init, prefetch, fetch


def _read_range(starts_ref):
    """Per-tile active plane interval [lo, hi), packed as lo*65536+hi into
    column 3 of plane 0 of the window-start table (a separate (1, 2) SMEM
    input would violate the TPU block-shape divisibility rules)."""
    v = starts_ref[0, 0, 3]
    return v // 65536, jax.lax.rem(v, 65536)


def _onehot_at(iota, pos):
    """One-hot row selector: 1.0 where ``iota == round(pos)``."""
    return (jnp.abs(iota - jnp.round(pos)) < 0.5).astype(jnp.float32)


def _get_lab(labwin, p, h, n_src_planes, blend):
    """Nearest-plane label window (labels are never interpolated)."""
    if not blend:
        return labwin[0]
    fx = _blend_fraction(p, h, n_src_planes)
    return jnp.where(fx > 0.5, labwin[1], labwin[0])


def _sample_labels(labwin, p, h, n_src, blend, starts_ref, iota_y,
                   iota_z, ry, rz, zc, precision):
    """Per-ray nearest-voxel label at this plane's sample points (1, TR).

    ``labwin`` is the raw (1|2, KY, ZW) label window from a window reader.
    """
    labwin = _get_lab(labwin, p, h, n_src, blend)
    labwin = _roll_window(labwin, starts_ref[0, p, 2], zc)
    ez = _onehot_at(iota_z, rz)  # (ZC, TR)
    ey = _onehot_at(iota_y, ry)  # (KY, TR)
    lab_t = _dot(labwin, ez, (((1,), (0,)), ((), ())), precision)  # (KY, TR)
    return jnp.sum(ey * lab_t, axis=0, keepdims=True)


def _channel_select(lab, n_ch_pad, tr):
    """(C_pad, TR) one-hot of each ray's label."""
    iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (n_ch_pad, tr), 0).astype(jnp.float32)
    return (jnp.abs(iota_c - jnp.round(lab)) < 0.5).astype(jnp.float32)


# =============================================================================
# Forward kernel
# =============================================================================


def _fwd_kernel(
    *refs, h, ky, zw, zc, precision, blend, n_ch=None, resident=False,
    reduce="sum",
):
    pair_ref = None
    if blend and resident and _PAIR_CACHE:
        # Sub-plane (literal trilinear) marching re-reads and re-rolls the
        # SAME two volume planes for every sample sharing a plane pair
        # (~1/h consecutive steps at h < 1). Cache the rolled f32 pair and
        # refresh it only when the pair or the window placement changes —
        # the per-step work drops to the (KY, ZC) lerp + tents + matmul.
        refs, pair_ref = refs[:-1], refs[-1]
    if n_ch is None:
        (starts_ref, rays_ref, vol_ref, out_ref,
         win_buf, acc_ref, sems) = refs
    else:
        (starts_ref, rays_ref, vol_ref, lab_ref, out_ref,
         win_buf, lab_buf, acc_ref, sems, lab_sems) = refs
    tr = rays_ref.shape[1]
    n_src = vol_ref.shape[0]
    r = _ray_rows(rays_ref)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ky, tr), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (zc, tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, h, ky, zw, blend, resident)
    if n_ch is not None:
        lab_init, lab_prefetch, lab_fetch = _window_reader(
            lab_ref, starts_ref, lab_buf, lab_sems, h, ky, zw, blend,
            resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)
    if n_ch is not None:
        lab_init(lo, hi)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(p, _):
        slot = jax.lax.rem(p - lo, 2)
        nxt = jax.lax.rem(p + 1 - lo, 2)
        win_prefetch(nxt, p + 1, hi)
        if n_ch is not None:
            lab_prefetch(nxt, p + 1, hi)

        _, _, _, scale, ry, rz = _plane_geometry(r, p, h, starts_ref)
        # Per-ray quadrature scale applied AFTER the y-reduce: the matmul and
        # tent builds stay unscaled ((1, TR) multiply instead of (ZC, TR)).
        wz = _tent(rz - iota_z)  # (ZC, TR)
        wy = _tent(ry - iota_y)  # (KY, TR)

        if pair_ref is not None:
            pm = jnp.maximum(p - 1, 0)
            same = ((p > lo)
                    & (_plane_index(p, h, n_src, True)
                       == _plane_index(pm, h, n_src, True))
                    & (starts_ref[0, p, 0] == starts_ref[0, pm, 0])
                    & (starts_ref[0, p, 1] == starts_ref[0, pm, 1])
                    & (starts_ref[0, p, 2] == starts_ref[0, pm, 2]))

            @pl.when(jnp.logical_not(same))
            def _():
                raw = win_fetch(slot, p)  # (2, KY, ZW) resident slice
                pair_ref[...] = _roll_window(
                    raw.astype(jnp.float32), starts_ref[0, p, 2], zc)

            fx = _blend_fraction(p, h, n_src)
            win = pair_ref[0] * (1.0 - fx) + pair_ref[1] * fx  # (KY, ZC)
        else:
            win = _blend_win(win_fetch(slot, p), p, h, n_src, blend)
            win = _roll_window(win, starts_ref[0, p, 2], zc)  # (KY, ZC)

        t1 = _dot(win, wz, (((1,), (0,)), ((), ())), precision)  # (KY, TR)
        contrib = jnp.sum(t1 * wy, axis=0, keepdims=True) * scale  # (1, TR)
        if n_ch is None:
            if reduce == "max":
                # Maximum intensity projection: matches the XLA oracle's
                # reduce over per-plane contributions (out-of-slab planes
                # contribute 0 there too, so the 0 init agrees whenever any
                # sample is out-of-slab or the density is nonnegative).
                # Rows: [0] running max, [1] argmax plane (the backward
                # kernels gate on it; first maximum wins on exact ties —
                # measure-zero at generic poses, like the tent-kink
                # subgradients).
                better = contrib > acc_ref[0:1, :]
                acc_ref[1:2, :] = jnp.where(
                    better, p.astype(jnp.float32), acc_ref[1:2, :])
                acc_ref[0:1, :] = jnp.where(better, contrib, acc_ref[0:1, :])
            else:
                acc_ref[...] += contrib
        else:
            lab = _sample_labels(lab_fetch(slot, p), p, h, n_src, blend,
                                 starts_ref, iota_y, iota_z, ry, rz, zc,
                                 precision)
            # Zero-length samples must not vote for a channel.
            lab = jnp.where(scale > 0.0, lab, -1.0)
            acc_ref[...] += _channel_select(lab, acc_ref.shape[0], tr) * contrib
        return ()

    if reduce == "max":
        # Row 1 (argmax plane) init -1: rays that never beat 0 gate every
        # backward plane off (zero gradient, matching a 0-valued max).
        acc_ref[1:2, :] = jnp.full_like(acc_ref[1:2, :], -1.0)
    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    out_ref[...] = acc_ref[...]


# =============================================================================
# Plane-major streaming forward
# =============================================================================


def _fwd_plane_major_kernel(
    starts_ref, starts0_ref, rays_ref, plane_ref, out_ref, acc_ref,
    *, h, ky, zw, zc, precision, n_tiles, TR,
):
    """One grid step = one marched PLANE for the whole frame.

    The tile-major streaming kernels issue one window DMA per (tile, plane)
    — ~25k small transfers per 512^3 frame whose issue latency dominates
    the streaming overhead even 4 slots deep. Here the grid marches planes
    and Pallas's block pipeline streams each full volume plane into VMEM
    exactly once (~500 large DMAs, total traffic = one volume read); every
    tile's (ky, zc) window is then a VMEM slice. Per-ray accumulators for
    the whole frame persist in scratch across the sequential grid (0.2-1 MB)
    and are written out at the last plane. FLOPs are identical to the
    tile-major kernel — only the memory movement changes.
    """
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ky, TR), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (zc, TR), 0).astype(jnp.float32)

    def tile_body(t, _):
        aux = starts0_ref[0, t, 3]
        lo = aux // 65536
        hi = jax.lax.rem(aux, 65536)

        @pl.when(jnp.logical_and(p >= lo, p < hi))
        def _():
            sl = pl.ds(t * TR, TR)
            r = {
                "a": rays_ref[_A:_A + 1, sl],
                "b": rays_ref[_B:_B + 1, sl],
                "gy": rays_ref[_GY:_GY + 1, sl],
                "dy": rays_ref[_DY:_DY + 1, sl],
                "gz": rays_ref[_GZ:_GZ + 1, sl],
                "dz": rays_ref[_DZ:_DZ + 1, sl],
                "sc": rays_ref[_SC:_SC + 1, sl],
                "amin": rays_ref[_AMIN:_AMIN + 1, sl],
                "amax": rays_ref[_AMAX:_AMAX + 1, sl],
            }
            ys = starts_ref[0, t, 0]
            zal = starts_ref[0, t, 1]
            zsh = starts_ref[0, t, 2]
            k = p.astype(jnp.float32) * h
            alpha = k * r["a"] + r["b"]
            inslab = jnp.logical_and(alpha >= r["amin"], alpha <= r["amax"])
            scale = jnp.where(inslab, r["sc"], 0.0)
            ry = r["gy"] + alpha * r["dy"] - ys.astype(jnp.float32)
            rz = (r["gz"] + alpha * r["dz"]
                  - (zal + zsh).astype(jnp.float32))
            wz = _tent(rz - iota_z)
            wy = _tent(ry - iota_y)
            win = plane_ref[0, pl.ds(pl.multiple_of(ys, 16), ky),
                            pl.ds(pl.multiple_of(zal, 128), zw)]
            win = _roll_window(win, zsh, zc)
            t1 = _dot(win, wz, (((1,), (0,)), ((), ())), precision)
            contrib = jnp.sum(t1 * wy, axis=0, keepdims=True) * scale
            acc_ref[:, sl] += contrib

        return ()

    jax.lax.fori_loop(0, n_tiles, tile_body, (), unroll=False)

    @pl.when(p == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _fwd_plane_major_call(vol, rays_tiled, starts, *, n_tiles, TR, n_planes,
                          h, ky, zw, zc, precision, interpret):
    hs = int(round(h))
    Xp, Yp, Zp = vol.shape
    kernel = functools.partial(
        _fwd_plane_major_kernel, h=float(h), ky=ky, zw=zw, zc=zc,
        precision=precision, n_tiles=n_tiles, TR=TR,
    )
    # Plane-major starts layout: Mosaic requires a block's trailing two
    # dims to be 8/128-divisible OR equal to the array dims — the
    # tile-major (n_tiles, 1, 4) block of a (n_tiles, n_planes, 4) array
    # violates that (caught only on hardware; interpret mode never
    # lowers). With the plane index LEADING, the (1, n_tiles, 4) block's
    # trailing dims equal the array dims.
    starts = starts.transpose(1, 0, 2)
    return pl.pallas_call(
        kernel,
        grid=(n_planes,),
        in_specs=[
            pl.BlockSpec((1, n_tiles, 4), lambda p: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_tiles, 4), lambda p: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_NROWS, n_tiles * TR), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Yp, Zp), lambda p: (p * hs, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tiles * TR), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TR), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n_tiles * TR), jnp.float32)],
        interpret=interpret,
    )(starts, starts, rays_tiled, vol)


# =============================================================================
# Backward kernels
# =============================================================================


def _bwd_rays_kernel(
    *refs, h, ky, zw, zc, precision, blend, n_ch=None, resident=False,
    mip=False,
):
    """Accumulate d(loss)/d(packed ray rows) for one ray tile.

    Chain rule per plane (out_i = sum_{m,n} wy win wz):
      dry = sum_m tent'(ry - m) * T1[m]          (T1 = win @ (wz*scale))
      drz = sum_n tent'(rz - n) * T2[n] * scale  (T2 = win^T-contraction @ wy)
      dsc = sum_n tent(rz - n) * T2[n] * inslab
      dgy += dry; ddy += dry*alpha; dgz += drz; ddz += drz*alpha
      da  += (dry*dy + drz*dz) * k; db += (dry*dy + drz*dz)
    In scalar mode the per-ray output cotangent g is constant across planes
    and applied once at the end; in channel mode each plane's terms are
    scaled by the cotangent of the channel its sample lands in (g-select).

    ``mip=True`` (reducefn="max" backward): an extra (1, TR) input carries
    each ray's forward argmax plane; every plane's terms are gated by
    ``p == argmax`` so only the winning sample contributes — the in-kernel
    equivalent of max's subgradient.
    """
    if n_ch is None:
        if mip:
            (starts_ref, rays_ref, g_ref, pbest_ref, vol_ref, dout_ref,
             win_buf, acc_ref, sems) = refs
        else:
            (starts_ref, rays_ref, g_ref, vol_ref, dout_ref,
             win_buf, acc_ref, sems) = refs
    else:
        (starts_ref, rays_ref, g_ref, vol_ref, lab_ref, dout_ref,
         win_buf, lab_buf, acc_ref, sems, lab_sems) = refs
    tr = rays_ref.shape[1]
    n_src = vol_ref.shape[0]
    r = _ray_rows(rays_ref)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ky, tr), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (zc, tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, h, ky, zw, blend, resident)
    if n_ch is not None:
        lab_init, lab_prefetch, lab_fetch = _window_reader(
            lab_ref, starts_ref, lab_buf, lab_sems, h, ky, zw, blend,
            resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)
    if n_ch is not None:
        lab_init(lo, hi)

    acc_ref[...] = jnp.zeros_like(acc_ref)  # (8, TR): a b gy dy gz dz sc pad

    def body(p, _):
        slot = jax.lax.rem(p - lo, 2)
        nxt = jax.lax.rem(p + 1 - lo, 2)
        win_prefetch(nxt, p + 1, hi)
        if n_ch is not None:
            lab_prefetch(nxt, p + 1, hi)

        k, alpha, inslab, scale, ry, rz = _plane_geometry(r, p, h, starts_ref)
        uy = ry - iota_y
        uz = rz - iota_z
        wy = _tent(uy)
        wz0 = _tent(uz)

        win = _blend_win(win_fetch(slot, p), p, h, n_src, blend)
        win = _roll_window(win, starts_ref[0, p, 2], zc)

        # One fused MXU contraction instead of two: with t4 = win @ wz0 and
        # t3 = win @ tent'(uz) (both over z), the chain-rule sums become
        # KY-row reductions —
        #   dry = scale * sum_m tent'(uy) t4   (t1 = win @ (wz0*scale)
        #                                       factors as scale * t4)
        #   drz = scale * sum_m wy t3          (swap the m/n summation order)
        #   dsc = [inslab] sum_m wy t4
        # One fused contraction measured faster than two separate dots
        # (5.77 vs 6.02 ms bwd kernel on v5e, round 4) — the concat copy is
        # cheaper than the second dot's issue overhead.
        rhs = jnp.concatenate([wz0, _tent_d(uz)], axis=1)  # (ZC, 2*TR)
        t43 = _dot(win, rhs, (((1,), (0,)), ((), ())), precision)
        t4 = t43[:, :tr]  # (KY, TR)
        t3 = t43[:, tr:]

        dry = jnp.sum(_tent_d(uy) * t4, axis=0, keepdims=True) * scale
        drz = jnp.sum(wy * t3, axis=0, keepdims=True) * scale
        dsc = jnp.sum(wy * t4, axis=0, keepdims=True)
        dsc = jnp.where(inslab, dsc, 0.0)

        if mip:
            sel = (p.astype(jnp.float32) == pbest_ref[0:1, :]).astype(
                jnp.float32)
            dry = dry * sel
            drz = drz * sel
            dsc = dsc * sel

        if n_ch is not None:
            lab = _sample_labels(lab_fetch(slot, p), p, h, n_src, blend,
                                 starts_ref, iota_y, iota_z, ry, rz, zc,
                                 precision)
            sel = _channel_select(lab, g_ref.shape[0], tr)
            gsel = jnp.sum(g_ref[...] * sel, axis=0, keepdims=True)
            dry = dry * gsel
            drz = drz * gsel
            dsc = dsc * gsel

        dalpha = dry * r["dy"] + drz * r["dz"]
        acc_ref[0:1, :] += dalpha * k
        acc_ref[1:2, :] += dalpha
        acc_ref[2:3, :] += dry
        acc_ref[3:4, :] += dry * alpha
        acc_ref[4:5, :] += drz
        acc_ref[5:6, :] += drz * alpha
        acc_ref[6:7, :] += dsc
        return ()

    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    g = 1.0 if n_ch is not None else g_ref[0:1, :]
    dout_ref[...] = jnp.zeros_like(dout_ref)
    dout_ref[_A : _A + 1, :] = acc_ref[0:1, :] * g
    dout_ref[_B : _B + 1, :] = acc_ref[1:2, :] * g
    dout_ref[_GY : _GY + 1, :] = acc_ref[2:3, :] * g
    dout_ref[_DY : _DY + 1, :] = acc_ref[3:4, :] * g
    dout_ref[_GZ : _GZ + 1, :] = acc_ref[4:5, :] * g
    dout_ref[_DZ : _DZ + 1, :] = acc_ref[5:6, :] * g
    dout_ref[_SC : _SC + 1, :] = acc_ref[6:7, :] * g


# Fused-output row layout (scalar mode): rows 0..6 are the g-independent
# gradient terms in dout order (_A.._SC), row 7 the rendered value, row 8
# the MIP argmax plane (-1 where nothing beat 0).
_FG_VAL = 7
_FG_PBEST = 8


def _fwdgrad_kernel(
    *refs, h, ky, zw, zc, precision, blend, resident=False, reduce="sum",
):
    """ONE march emitting the value AND the per-ray gradient terms.

    Key observation (round 4): in scalar (non-channel) mode the backward
    kernel applies the output cotangent ``g`` only ONCE, at the very end
    (``dout = acc * g``) — the accumulated terms are g-independent. The
    whole analytic pose backward therefore factors as

        d(rays) = rows(rays, volume) * g[ray]

    with ``rows`` computable during the forward march. Under ``jax.grad``
    the custom-VJP forward runs THIS kernel instead of ``_fwd_kernel`` +
    a separate ``_bwd_rays_kernel`` re-march: the value falls out of the
    same contractions the gradient needs (``contrib = dsc * scale``), so
    fwd+pose-bwd costs ONE gradient-march instead of a forward march plus
    a gradient march (measured: joseph 200^2 fwd+pose-bwd 11.2 -> ~8 ms on
    v5e). Not used in channel mode (the cotangent enters per-plane there)
    or on the plain inference path (``_fwd_kernel`` stays cheaper).

    ``reduce="max"``: terms are REPLACED (not accumulated) whenever the
    plane's contribution beats the running maximum — the online form of
    max's argmax-gated subgradient; the winning plane rides out in row
    ``_FG_PBEST`` for the volume-gradient kernel.
    """
    (starts_ref, rays_ref, vol_ref, out_ref, win_buf, acc_ref, sems) = refs
    tr = rays_ref.shape[1]
    n_src = vol_ref.shape[0]
    r = _ray_rows(rays_ref)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ky, tr), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (zc, tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, h, ky, zw, blend, resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    mip = reduce == "max"
    if mip:
        acc_ref[_FG_PBEST : _FG_PBEST + 1, :] = jnp.full_like(
            acc_ref[_FG_PBEST : _FG_PBEST + 1, :], -1.0)

    def body(p, _):
        slot = jax.lax.rem(p - lo, 2)
        nxt = jax.lax.rem(p + 1 - lo, 2)
        win_prefetch(nxt, p + 1, hi)

        k, alpha, inslab, scale, ry, rz = _plane_geometry(r, p, h, starts_ref)
        uy = ry - iota_y
        uz = rz - iota_z
        wy = _tent(uy)
        wz0 = _tent(uz)

        win = _blend_win(win_fetch(slot, p), p, h, n_src, blend)
        win = _roll_window(win, starts_ref[0, p, 2], zc)

        rhs = jnp.concatenate([wz0, _tent_d(uz)], axis=1)  # (ZC, 2*TR)
        t43 = _dot(win, rhs, (((1,), (0,)), ((), ())), precision)
        t4 = t43[:, :tr]  # (KY, TR)
        t3 = t43[:, tr:]

        dry = jnp.sum(_tent_d(uy) * t4, axis=0, keepdims=True) * scale
        drz = jnp.sum(wy * t3, axis=0, keepdims=True) * scale
        dsc = jnp.sum(wy * t4, axis=0, keepdims=True)
        dsc = jnp.where(inslab, dsc, 0.0)
        contrib = dsc * scale  # == the forward kernel's value contribution

        dalpha = dry * r["dy"] + drz * r["dz"]
        terms = (dalpha * k, dalpha, dry, dry * alpha, drz, drz * alpha, dsc)
        if mip:
            better = contrib > acc_ref[_FG_VAL : _FG_VAL + 1, :]
            for i, tm in enumerate(terms):
                acc_ref[i : i + 1, :] = jnp.where(better, tm,
                                                  acc_ref[i : i + 1, :])
            acc_ref[_FG_PBEST : _FG_PBEST + 1, :] = jnp.where(
                better, p.astype(jnp.float32),
                acc_ref[_FG_PBEST : _FG_PBEST + 1, :])
            acc_ref[_FG_VAL : _FG_VAL + 1, :] = jnp.where(
                better, contrib, acc_ref[_FG_VAL : _FG_VAL + 1, :])
        else:
            for i, tm in enumerate(terms):
                acc_ref[i : i + 1, :] += tm
            acc_ref[_FG_VAL : _FG_VAL + 1, :] += contrib
        return ()

    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    out_ref[...] = acc_ref[...]


def _fwdgrad_call(vol, rays_tiled, starts, *, n_tiles, TR, n_planes, h, ky,
                  zw, zc, precision, blend, n_ch, resident, interpret,
                  reduce="sum"):
    assert n_ch is None, "fused fwd+grad is scalar-mode only"
    kernel = functools.partial(
        _fwdgrad_kernel, h=h, ky=ky, zw=zw, zc=zc, precision=precision,
        blend=blend, resident=resident, reduce=reduce,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_common_specs(n_planes, TR) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_NROWS, TR), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_NROWS, n_tiles * TR), jnp.float32),
        scratch_shapes=[
            _win_scratch(vol, ky, zw, blend, resident),
            pltpu.VMEM((_NROWS, TR), jnp.float32),
            _win_sems(),
        ],
        interpret=interpret,
        **_vmem_params(resident, vol),
    )(starts, rays_tiled, vol)


def _rmw_double_buffered(lo, hi, load_dma, store_dma, win_buf, dwin_buf,
                         compute_dwin):
    """Double-buffered read-modify-write DMA pipeline over DISJOINT windows.

    Per plane ``p``: prefetch plane ``p+1``'s load (overlaps with compute),
    compute this plane's gradient window (``compute_dwin(p)``, shaped like one
    ``win_buf`` slot), wait the two-iterations-ago store on this slot, wait
    this plane's load, accumulate into ``dwin_buf``, start the store. Two
    trailing waits drain the pipeline.

    REQUIRES that distinct planes' volume windows are disjoint: a store to
    plane ``p`` is only known complete at slot reuse (``p+2``), so overlapping
    windows would race (joseph blend mode serializes instead). Shared by the
    joseph and exact-Siddon d/d(volume) kernels.

    Scheduling note: the plane ``p+1`` load prefetch issues BEFORE
    ``compute_dwin(p)`` (siddon's original order, adopted by joseph when the
    two pipelines were unified) — safe under window disjointness, and it
    overlaps the DMA with the plane's matmul instead of issuing it after."""

    @pl.when(lo < hi)
    def _():
        load_dma(0, lo).start()

    def body(p, _):
        slot = jax.lax.rem(p - lo, 2)

        @pl.when(p + 1 < hi)
        def _():
            load_dma(jax.lax.rem(p + 1 - lo, 2), p + 1).start()

        dwin = compute_dwin(p)

        # Wait for the previous store on this buffer slot before reuse.
        @pl.when(p >= lo + 2)
        def _():
            store_dma(slot, p - 2).wait()

        load_dma(slot, p).wait()
        dwin_buf[slot] = win_buf[slot] + dwin
        store_dma(slot, p).start()
        return ()

    jax.lax.fori_loop(lo, hi, body, (), unroll=False)

    @pl.when(hi - lo >= 2)
    def _():
        store_dma(jax.lax.rem(hi - 2 - lo, 2), hi - 2).wait()

    @pl.when(hi - lo >= 1)
    def _():
        store_dma(jax.lax.rem(hi - 1 - lo, 2), hi - 1).wait()


def _bwd_vol_kernel(
    *refs, h, ky, zw, zc, precision, blend, n_ch=None, mip=False,
):
    """Accumulate d(loss)/d(volume): dWin = (wy * g) @ (wz*scale)^T per plane,
    read-modify-written into the aliased gradient volume.

    Integer stride: windows of distinct planes are disjoint, so the load/store
    pipeline double-buffers (``_rmw_double_buffered``). Blend mode: adjacent
    plane-pair windows overlap in one plane, so each store completes before
    the next load issues (serialized RMW). Channel mode replaces the constant
    per-ray g with the per-plane channel-selected cotangent. ``mip=True``
    gates each plane's cotangent by ``p == argmax`` (see _bwd_rays_kernel).
    """
    if n_ch is None:
        if mip:
            (starts_ref, rays_ref, g_ref, pbest_ref, vol_ref, dvol_in_ref,
             dvol_ref, win_buf, dwin_buf, sems, store_sems) = refs
        else:
            (starts_ref, rays_ref, g_ref, vol_ref, dvol_in_ref,
             dvol_ref, win_buf, dwin_buf, sems, store_sems) = refs
        lab_ref = lab_buf = lab_sems = None
    else:
        (starts_ref, rays_ref, g_ref, vol_ref, lab_ref,
         dvol_in_ref, dvol_ref, win_buf, dwin_buf, lab_buf, sems, store_sems,
         lab_sems) = refs
    del vol_ref  # the forward volume is not needed for its gradient
    tr = rays_ref.shape[1]
    n_src = dvol_ref.shape[0]
    xp = 2 if blend else 1
    r = _ray_rows(rays_ref)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ky, tr), 0).astype(jnp.float32)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (zc, tr), 0).astype(jnp.float32)
    g = g_ref[0:1, :] if n_ch is None else None
    if n_ch is not None:
        lab_dma = _make_window_dma(lab_ref, starts_ref, lab_buf, lab_sems, h,
                                   ky, zw, blend)
    lo, hi = _read_range(starts_ref)

    def load_dma(slot, plane_idx):
        k = _plane_index(plane_idx, h, n_src, blend)
        ys = pl.multiple_of(starts_ref[0, plane_idx, 0], 16)
        zs = pl.multiple_of(starts_ref[0, plane_idx, 1], 128)
        return pltpu.make_async_copy(
            dvol_ref.at[pl.ds(k, xp), pl.ds(ys, ky), pl.ds(zs, zw)],
            win_buf.at[slot],
            sems.at[slot],
        )

    def store_dma(slot, plane_idx):
        k = _plane_index(plane_idx, h, n_src, blend)
        ys = pl.multiple_of(starts_ref[0, plane_idx, 0], 16)
        zs = pl.multiple_of(starts_ref[0, plane_idx, 1], 128)
        return pltpu.make_async_copy(
            dwin_buf.at[slot],
            dvol_ref.at[pl.ds(k, xp), pl.ds(ys, ky), pl.ds(zs, zw)],
            store_sems.at[slot],
        )

    def compute_dwin(p):  # -> (KY, ZW), this plane's gradient window
        if n_ch is not None:
            @pl.when(p + 1 < hi)
            def _():
                lab_dma(jax.lax.rem(p + 1 - lo, 2), p + 1).start()

        _, _, _, scale, ry, rz = _plane_geometry(r, p, h, starts_ref)
        if n_ch is None:
            gp = g
            if mip:
                gp = gp * (p.astype(jnp.float32) == pbest_ref[0:1, :]
                           ).astype(jnp.float32)
        else:
            lab_dma(jax.lax.rem(p - lo, 2), p).wait()
            lab = _sample_labels(lab_buf[jax.lax.rem(p - lo, 2)], p, h, n_src,
                                 blend, starts_ref, iota_y, iota_z, ry, rz,
                                 zc, precision)
            sel = _channel_select(lab, g_ref.shape[0], tr)
            gp = jnp.sum(g_ref[...] * sel, axis=0, keepdims=True)
        wyg = _tent(ry - iota_y) * gp  # (KY, TR)
        wzs = _tent(rz - iota_z) * scale  # (ZC, TR)
        dwin = _dot(wyg, wzs, (((1,), (1,)), ((), ())), precision)  # (KY, ZC)
        if zc != zw:
            # Un-roll: place the compact gradient window back at its true
            # lane offset inside the aligned (KY, ZW) frame.
            dwin = jnp.pad(dwin, ((0, 0), (0, zw - zc)))
            dwin = pltpu.roll(dwin, starts_ref[0, p, 2], axis=1)
        return dwin

    if n_ch is not None:
        @pl.when(lo < hi)
        def _():
            lab_dma(0, lo).start()

    if blend:
        # Adjacent plane-pair windows OVERLAP in one plane: serialize the RMW
        # (each store completes before the next load issues).
        @pl.when(lo < hi)
        def _():
            load_dma(0, lo).start()

        def body(p, _):
            slot = jax.lax.rem(p - lo, 2)
            dwin = compute_dwin(p)
            fx = _blend_fraction(p, h, n_src)
            dpair = jnp.stack([dwin * (1.0 - fx), dwin * fx])
            load_dma(slot, p).wait()
            dwin_buf[slot] = win_buf[slot] + dpair
            store_dma(slot, p).start()
            # Overlapping windows: complete the store before the next load.
            store_dma(slot, p).wait()

            @pl.when(p + 1 < hi)
            def _():
                load_dma(jax.lax.rem(p + 1 - lo, 2), p + 1).start()
            return ()

        jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    else:
        _rmw_double_buffered(lo, hi, load_dma, store_dma, win_buf, dwin_buf,
                             lambda p: compute_dwin(p)[None])


# =============================================================================
# XLA-side preparation (pure, differentiable where it must be)
# =============================================================================


def plan_tiles(height: int, width: int, tile: int) -> Tuple[np.ndarray, int, int]:
    """Row-major pixel order -> square-tile order permutation.

    Returns (perm, n_tiles, padded_n) where ``perm[i]`` is the original ray
    index placed at tiled position i (padding positions get -1).
    """
    th = -(-height // tile)
    tw = -(-width // tile)
    n_tiles = th * tw
    padded = n_tiles * tile * tile
    perm = np.full(padded, -1, np.int64)
    pos = 0
    for bi in range(th):
        for bj in range(tw):
            for ii in range(tile):
                for jj in range(tile):
                    r, c = bi * tile + ii, bj * tile + jj
                    if r < height and c < width:
                        perm[pos] = r * width + c
                    pos += 1
    return perm, n_tiles, padded


@functools.lru_cache(maxsize=64)
def _plan_tiles_cached(height, width, tile):
    return plan_tiles(height, width, tile)


def _subset_perm(height, width, tile, subset):
    """Tile-order permutation restricted to the ``subset`` of tile indices.

    Returns ``perm[i]`` = original row-major ray index at packed position
    ``i`` (-1 at padding), for ``len(subset) * tile**2`` packed positions.
    """
    perm, n_tiles_img, _ = _plan_tiles_cached(height, width, tile)
    if subset is None:
        return perm, n_tiles_img
    TR = tile * tile
    sel = np.asarray(subset, np.int64)
    return perm.reshape(n_tiles_img, TR)[sel].reshape(-1), len(subset)


@functools.lru_cache(maxsize=64)
def _make_tile_gather(height, width, tile, subset=None):
    """Row-major -> tile-order gather with an EXACT inverse-permutation VJP.

    XLA's autodiff of a gather emits a scatter-add; because ``perm`` is a
    permutation with -1 padding (every real index appears exactly once), the
    linear transpose is just a gather by the inverse permutation with padded
    columns dropped. Keeps the registration backward free of TPU scatters.

    ``subset`` (sparse rendering): only the listed detector tiles are packed;
    rays outside them receive zero cotangents (they are not rendered).
    """
    # All index tables are built in NumPy: the factory is lru_cached, so a
    # traced op here (e.g. jnp.maximum) would leak its tracer into later
    # traces through the cached closure.
    perm, _ = _subset_perm(height, width, tile, subset)
    safe = np.maximum(perm, 0)
    pad_col = np.asarray(perm < 0)
    N = height * width
    inv = np.full(N, -1, np.int64)
    inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
    inv_safe = np.maximum(inv, 0)
    inv_pad = np.asarray(inv < 0)
    inv_j = np.asarray(inv_safe)

    @jax.custom_vjp
    def gather(rays_b):  # (R, B, N) -> (R, B, packed), pad cols zeroed
        out = rays_b[:, :, safe]
        return jnp.where(pad_col[None, None, :], 0.0, out)

    def fwd(rays_b):
        return gather(rays_b), ()

    if subset is None:

        def bwd(_, g):
            return (g[:, :, inv_j],)
    else:

        def bwd(_, g):
            out = g[:, :, inv_j]
            return (jnp.where(inv_pad[None, None, :], 0.0, out),)

    gather.defvjp(fwd, bwd)
    return gather


def _prep_vol(volume, perm3, ky, zw, storage=None, xpad=0):
    vol = jnp.transpose(volume, perm3)
    if storage == "bf16":
        vol = vol.astype(jnp.bfloat16)
    Y, Z = vol.shape[1], vol.shape[2]
    ypad = max(0, ky - Y)
    # Pad Z to BOTH >= zw and a multiple of 128: _compute_starts clamps the
    # window start to Z - zw, and the kernels promise Mosaic that z-starts
    # are 128-aligned (pl.multiple_of) — an unaligned Z - zw (e.g. raw
    # extent 320 with zw=256) would violate that at runtime.
    zpad = max(zw, -(-Z // 128) * 128) - Z
    if xpad or ypad or zpad:
        vol = jnp.pad(vol, ((0, xpad), (0, ypad), (0, zpad)))
    return vol


def _prep_rays(source, target, weights, perm3, dims, H, W, tile,
               voxel_shift, h, eps, quadrature="joseph", tile_subset=None):
    """Pack per-ray kernel rows in detector-tile order. Differentiable.

    Fully batch-vectorized: output columns are ordered
    ``[batch 0 tiles..., batch 1 tiles..., ...]``. ``tile_subset`` packs
    only the listed detector tiles (sparse rendering).

    The tile permutation is applied to the INPUTS (target + weights, 4
    rows) and the per-ray algebra runs on packed columns — not the other
    way around. Same values either way, but the AD pullback then inverts
    the permutation on a 4-row cotangent instead of the _NROWS-row packed
    rays; the round-5 device trace showed the 16-row inverse gather
    costing ~2.1 ms/iter of dynamic-update-slices at 200^2 (~20% of the
    whole fwd+pose-bwd step).
    """
    B, N, _ = target.shape
    tw = jnp.concatenate(
        [jnp.moveaxis(target, -1, 0), weights.reshape(1, B, N)], axis=0)
    tw_t = _make_tile_gather(H, W, tile, tile_subset)(tw)  # (4, B, packed)
    packed = tw_t.shape[-1]
    target = jnp.moveaxis(tw_t[:3], 0, -1)  # (B, packed, 3)
    weights = tw_t[3].reshape(B, 1, packed)
    N = packed

    off = voxel_shift - 0.5
    gs = jnp.broadcast_to(source, target.shape) + off
    gt = target + off
    d = gt - gs + eps
    gs = gs[..., list(perm3)].reshape(B * N, 3)
    d = d[..., list(perm3)].reshape(B * N, 3)
    w = weights.reshape(B * N)

    inv_dx = 1.0 / d[:, 0]
    # Joseph folds the per-plane quadrature d(alpha) into the scale; Siddon
    # segment lengths are already parametric, so only the ray weight rides.
    alpha_scale = jnp.abs(inv_dx) * h if quadrature == "joseph" else 1.0

    dims_arr = jnp.asarray([dims[p] for p in perm3], gs.dtype)
    s_un = gs - off
    min_plane = -voxel_shift
    max_plane = dims_arr + 1.0 - voxel_shift
    a0 = (min_plane - s_un) / d
    a1 = (max_plane - s_un) / d
    # min over axes of the per-axis maxima (the LAST exit wins would be
    # wrong: the ray leaves the volume at the FIRST exit). Round-4 fix: this
    # was jnp.max, so rays exiting through a transverse face kept "in-slab"
    # past their exit and deposited partial-tent weight on boundary voxels —
    # invisible in forward parity (boundary densities ~0 on the phantom,
    # and nearest/one-hot kernels clip harder) but a 12.5% relative error
    # on boundary-voxel volume gradients (caught by
    # tests/test_tpu_hardware.py::test_volume_gradient_parity_on_hardware
    # at 256^2; tests/test_joseph.py has the CPU regression).
    amin_raw = jnp.max(jnp.minimum(a0, a1), axis=-1)
    amax_raw = jnp.min(jnp.maximum(a0, a1), axis=-1)
    if quadrature == "joseph":
        amin = jnp.clip(amin_raw, 0.0, None)
        amax = jnp.minimum(amax_raw, 1.0)
    else:
        # Exact Siddon: the reference's sort-based integral covers the FULL
        # line's crossing of the volume — it never restricts to the
        # [source, target] parametric segment (renderers.py:94-113 sorts
        # every plane crossing; _get_alpha_minmax's [0, 1] clamp is only
        # used by Trilinear / the filter flag). A [0, 1] clip here silently
        # truncated rays whose DETECTOR sits inside a tall volume (second
        # round-4 hardware find, 30% undercount on central rays at
        # 96x96x320; tests/test_pallas_siddon.py has the regression).
        amin, amax = amin_raw, amax_raw

    rays = jnp.zeros((_NROWS, B * N), jnp.float32)
    rays = rays.at[_A].set(inv_dx)
    rays = rays.at[_B].set(-gs[:, 0] * inv_dx)
    rays = rays.at[_GY].set(gs[:, 1])
    rays = rays.at[_DY].set(d[:, 1])
    rays = rays.at[_GZ].set(gs[:, 2])
    rays = rays.at[_DZ].set(d[:, 2])
    rays = rays.at[_SC].set(w * alpha_scale)
    # amin/amax ARE differentiated: the exact-Siddon backward kernel emits
    # boundary cotangents on these rows (the integral's -V(entry) d(amin)
    # + V(exit) d(amax) terms, which the reference also carries); the
    # joseph/raymarch kernels emit zeros there (hard slab mask, zero a.e.
    # derivative, matching their XLA oracles).
    rays = rays.at[_AMIN].set(amin)
    rays = rays.at[_AMAX].set(amax)

    perm, _ = _subset_perm(H, W, tile, tile_subset)
    perm_j = jnp.asarray(perm)

    # Padding rays must be NEUTRAL: an empty slab interval (amin > amax)
    # keeps them out of the window minima, the active-range table, and the
    # integral. The input gather zero-fills pad columns, which the algebra
    # above turns into finite junk rays (target 0 -> ray toward the
    # origin) — they would otherwise read as active and pull edge-tile
    # windows toward voxel 0, clipping the real rays.
    out = rays.reshape(_NROWS, B, N)
    pad_col = (perm_j < 0)[None, :]
    out = out.at[_AMIN].set(jnp.where(pad_col, 2.0, out[_AMIN]))
    out = out.at[_AMAX].set(jnp.where(pad_col, -2.0, out[_AMAX]))
    return out.reshape(_NROWS, B * perm.shape[0])


def _compute_starts(rays_tiled, n_tiles, TR, n_planes, h, Y, Z, ky, zw, zc,
                    with_fit=False, y0=None, z0=None, quadrature="joseph"):
    """Per (tile, plane) window placement + per-tile active plane ranges.

    Non-differentiable. Returns starts (n_tiles, n_planes, 4) int32, columns
    [ystart (16-aligned), zstart_aligned (128-aligned), zshift, aux]
    where the true z window is ``[zstart_aligned + zshift, + zc)`` and the
    DMA fetches ``[zstart_aligned, + zw)``. Coverage invariants:
    zshift <= zw - zc and the footprint fits in (ky, zc).

    The aux column of plane 0 packs the tile's active plane interval
    [lo, hi) — the contiguous planes where at least one ray is inside the
    volume slab — as ``lo * 65536 + hi``; the kernels march only this
    interval (see ``_read_range``).

    ``with_fit=True`` additionally returns a scalar bool: does EVERY
    (tile, plane) footprint actually fit the planned (ky, zc) window?
    Exact (max-reduces over the same intermediates), used by the dispatch
    guard so undersized static windows fall back instead of silently
    clipping peripheral samples.
    """
    rt = jax.lax.stop_gradient(rays_tiled).reshape(_NROWS, n_tiles, TR)
    big = jnp.float32(1e9)

    # Scan over plane CHUNKS: materializing (tiles, TR, P) at once costs
    # gigabytes for megapixel detectors, while many tiny scan steps serialize
    # the render's fixed overhead. Budget ~128 MB per intermediate: common
    # sizes (200^2: 169 tiles) run as ONE fused op, megapixel detectors get
    # a handful of large chunks.
    budget_elems = 32 * 2**20
    chunk = int(np.clip(budget_elems // max(1, n_tiles * TR), 8, n_planes))
    n_chunks = -(-n_planes // chunk)
    ks = jnp.arange(n_chunks * chunk, dtype=jnp.float32) * h
    ks_chunks = ks.reshape(n_chunks, chunk)

    def chunk_minima(_, kc):
        amin = rt[_AMIN][..., None]
        amax = rt[_AMAX][..., None]
        if quadrature == "siddon":
            # Slab quadrature: slab k spans alpha([k-h/2, k+h/2]) clipped to
            # [amin, amax]; activity and window extrema must come from the
            # clipped INTERVAL, not the center sample — a ray entering the
            # volume mid-slab has a partial segment in a slab whose center
            # alpha is outside [amin, amax] (it would otherwise be dropped,
            # losing up to h/2 of boundary path length per ray).
            a_f0 = rt[_A][..., None] * (kc[None, None, :] - 0.5 * h) + rt[_B][..., None]
            a_f1 = rt[_A][..., None] * (kc[None, None, :] + 0.5 * h) + rt[_B][..., None]
            lo_c = jnp.minimum(a_f0, a_f1)
            hi_c = jnp.maximum(a_f0, a_f1)
            ins = jnp.maximum(lo_c, amin) <= jnp.minimum(hi_c, amax)
            c0 = jnp.clip(lo_c, amin, amax)
            c1 = jnp.clip(hi_c, amin, amax)
            ya = rt[_GY][..., None] + c0 * rt[_DY][..., None]
            yb = rt[_GY][..., None] + c1 * rt[_DY][..., None]
            za = rt[_GZ][..., None] + c0 * rt[_DZ][..., None]
            zb = rt[_GZ][..., None] + c1 * rt[_DZ][..., None]
            y_lo, y_hi = jnp.minimum(ya, yb), jnp.maximum(ya, yb)
            z_lo, z_hi = jnp.minimum(za, zb), jnp.maximum(za, zb)
        else:
            alpha = rt[_A][..., None] * kc[None, None, :] + rt[_B][..., None]
            y_lo = y_hi = rt[_GY][..., None] + alpha * rt[_DY][..., None]
            z_lo = z_hi = rt[_GZ][..., None] + alpha * rt[_DZ][..., None]
            ins = (alpha >= amin) & (alpha <= amax)
        y_min_k = jnp.min(jnp.where(ins, y_lo, big), axis=1)  # (tiles, chunk)
        z_min_k = jnp.min(jnp.where(ins, z_lo, big), axis=1)
        if not with_fit:
            return None, (y_min_k, z_min_k)
        y_max_k = jnp.max(jnp.where(ins, y_hi, -big), axis=1)
        z_max_k = jnp.max(jnp.where(ins, z_hi, -big), axis=1)
        return None, (y_min_k, z_min_k, y_max_k, z_max_k)

    _, mins = jax.lax.scan(chunk_minima, None, ks_chunks)

    def flat(x):  # (n_chunks, tiles, chunk) -> (tiles, P)
        return jnp.moveaxis(x, 0, 1).reshape(n_tiles, -1)[:, :n_planes]

    y_min, z_min = flat(mins[0]), flat(mins[1])

    # Active plane interval per tile: planes where any ray is in-slab form a
    # contiguous interval (each ray's in-slab set is an alpha interval, and
    # the tile's rays overlap).
    active = y_min < big  # (tiles, P)
    idx = jnp.arange(n_planes, dtype=jnp.int32)[None, :]
    lo = jnp.min(jnp.where(active, idx, n_planes), axis=1).astype(jnp.int32)
    hi = (jnp.max(jnp.where(active, idx, -1), axis=1) + 1).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    ystart = jnp.clip(jnp.floor(y_min) - 2, 0, Y - ky).astype(jnp.int32)
    # 16-alignment covers both f32 (8, 128) and bf16 (16, 128) HBM tilings.
    ystart = (ystart // 16) * 16
    zdes = jnp.clip(jnp.floor(z_min) - 2, 0, max(0, Z - zc)).astype(jnp.int32)
    zal = jnp.minimum((zdes // 128) * 128, max(0, Z - zw))
    zshift = zdes - zal
    aux = jnp.zeros_like(ystart).at[:, 0].set(lo * 65536 + hi)
    starts = jnp.stack([ystart, zal, zshift, aux], axis=-1)
    if not with_fit:
        return starts
    # Fit check. Highest index a kernel can touch for a sample at position
    # p: floor(p)+1 (joseph tent / bilinear upper corner); Siddon's segment
    # endpoints extend up to 0.5 plane-widths beyond the plane-center
    # positions reduced here, and its corner is round(p)+1 — both bounded
    # by floor(p_max)+2. Indices beyond the ORIGINAL volume extent (y0/z0,
    # pre-padding) read zero padding, which is correct ("outside the volume
    # is air"), so the requirement clamps there. Inactive planes pass
    # trivially.
    y_max, z_max = flat(mins[2]), flat(mins[3])
    y0 = Y if y0 is None else y0
    z0 = Z if z0 is None else z0
    req_y = jnp.minimum(jnp.floor(y_max) + 2, y0 - 1)
    req_z = jnp.minimum(jnp.floor(z_max) + 2, z0 - 1)
    fit_y = req_y <= (ystart + (ky - 1)).astype(jnp.float32)
    fit_z = req_z <= (zal + zshift + (zc - 1)).astype(jnp.float32)
    fits = jnp.all(jnp.where(active, fit_y & fit_z, True))
    return starts, fits


def footprint_fits(
    source, target, weights, *, dims, image_shape, axis, tile, ky, zw, zc,
    voxel_shift=0.5, step=1.0, n_steps=None, eps=1e-8, quadrature="joseph",
):
    """Exact runtime probe: do all (tile, plane) footprints fit the planned
    (ky, zc) windows for this pose?

    Returns a scalar bool (stop-gradient, jit-safe). The static windows are
    sized for a conservative worst-case magnification; poses that exceed it
    (volume pushed past the detector, strongly oblique rays with an explicit
    march axis, or an aggressive ``pallas_fp_scale``) would silently clip
    peripheral samples — the DRR dispatch uses this probe to fall back to
    the XLA renderers instead. Cost: one ray packing + one plane scan
    (~the window-start precompute, well under a millisecond at 200^2).
    """
    H, W = image_shape
    h = float(step)
    if n_steps is None:
        n_steps = int(-(-dims[axis] // h))
    perm3 = (axis,) + tuple(d for d in range(3) if d != axis)
    rays_tiled = _prep_rays(source, target, weights, perm3, dims, H, W,
                            tile, voxel_shift, h, eps)
    B = target.shape[0]
    _, n_tiles_img, _ = _plan_tiles_cached(H, W, tile)
    Y = max(dims[perm3[1]], ky)  # _prep_vol's padded extents
    Z = max(-(-dims[perm3[2]] // 128) * 128, zw)
    _, fits = _compute_starts(
        rays_tiled, B * n_tiles_img, tile * tile, int(n_steps), h, Y, Z,
        ky, zw, zc, with_fit=True,
        y0=dims[perm3[1]], z0=dims[perm3[2]], quadrature=quadrature,
    )
    return fits


# =============================================================================
# pallas_call wrappers + custom VJP
# =============================================================================


def _common_specs(n_planes, TR):
    return [
        pl.BlockSpec((1, n_planes, 4), lambda t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((_NROWS, TR), lambda t: (0, t), memory_space=pltpu.VMEM),
    ]


# VMEM-resident volume budget: the whole (permuted, padded) volume must fit
# in VMEM scratch alongside the ray blocks. v5e/v6e have 128 MiB VMEM/core
# (probed empirically; the conservative spec says less — kept under a knob).
_RESIDENT_BUDGET = 96 * 2**20


def _resident_bytes(dims, axis, ky, zw, blend, itemsize):
    """Bytes of the permuted/padded volume as the kernels see it."""
    other = tuple(d for d in range(3) if d != axis)
    n_src = dims[axis] + (1 if blend else 0)
    Y = max(dims[other[0]], ky)
    # Mirrors _prep_vol: Z pads to BOTH >= zw and a 128 multiple.
    Z = max(-(-dims[other[1]] // 128) * 128, zw)
    return n_src * Y * Z * itemsize


def _win_scratch(arr, ky, zw, blend, resident):
    """Window scratch: the whole volume when resident, else ``_DMA_SLOTS``
    streaming slots (the reader keeps slots-1 window DMAs in flight)."""
    if resident:
        return pltpu.VMEM(arr.shape, arr.dtype)
    xp = 2 if blend else 1
    return pltpu.VMEM((_DMA_SLOTS, xp, ky, zw), arr.dtype)


def _win_sems():
    """DMA semaphores matching the reader's slot count."""
    return pltpu.SemaphoreType.DMA((_DMA_SLOTS,))


def _vmem_params(resident, *arrs):
    """compiler_params kwargs: raise the VMEM cap for resident volumes."""
    if not resident:
        return {}
    need = sum(a.nbytes for a in arrs if a is not None) + 16 * 2**20
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=min(need, 127 * 2**20))}


def _fwd_call(vol, rays_tiled, starts, lab, *, n_tiles, TR, n_planes,
              h, ky, zw, zc, precision, blend, n_ch, resident, interpret,
              reduce="sum"):
    kernel = functools.partial(
        _fwd_kernel, h=h, ky=ky, zw=zw, zc=zc, precision=precision,
        blend=blend, n_ch=n_ch, resident=resident, reduce=reduce,
    )
    if n_ch is None:
        rows = 2 if reduce == "max" else 1  # max: [value; argmax plane]
    else:
        rows = -(-n_ch // 8) * 8
    lab_in = [] if n_ch is None else [pl.BlockSpec(memory_space=pl.ANY)]
    lab_scratch = [] if n_ch is None else [
        _win_scratch(lab, ky, zw, blend, resident)]
    lab_sems = [] if n_ch is None else [_win_sems()]
    args = (starts, rays_tiled, vol) + (() if n_ch is None else (lab,))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_common_specs(n_planes, TR) + [
            pl.BlockSpec(memory_space=pl.ANY),
        ] + lab_in,
        out_specs=pl.BlockSpec((rows, TR), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles * TR), jnp.float32),
        scratch_shapes=[
            _win_scratch(vol, ky, zw, blend, resident),
        ] + lab_scratch + [
            pltpu.VMEM((rows, TR), jnp.float32),
            _win_sems(),
        ] + lab_sems + (
            # Rolled plane-pair cache for sub-plane (literal) marching —
            # must stay LAST (the kernel pops it off the ref tail).
            [pltpu.VMEM((2, ky, zc), jnp.float32)]
            if (blend and resident and _PAIR_CACHE) else []),
        interpret=interpret,
        **_vmem_params(resident, vol, lab if n_ch is not None else None),
    )(*args)


def _bwd_rays_call(vol, rays_tiled, starts, g_tiled, lab, *, n_tiles,
                   TR, n_planes, h, ky, zw, zc, precision, blend, n_ch,
                   resident, interpret, pbest=None):
    mip = pbest is not None
    kernel = functools.partial(
        _bwd_rays_kernel, h=h, ky=ky, zw=zw, zc=zc, precision=precision,
        blend=blend, n_ch=n_ch, resident=resident, mip=mip,
    )
    rows = 1 if n_ch is None else -(-n_ch // 8) * 8
    pb_in = [pl.BlockSpec((1, TR), lambda t: (0, t),
                          memory_space=pltpu.VMEM)] if mip else []
    lab_in = [] if n_ch is None else [pl.BlockSpec(memory_space=pl.ANY)]
    lab_scratch = [] if n_ch is None else [
        _win_scratch(lab, ky, zw, blend, resident)]
    lab_sems = [] if n_ch is None else [_win_sems()]
    args = (starts, rays_tiled, g_tiled) + (
        (pbest,) if mip else ()) + (vol,) + (
        () if n_ch is None else (lab,))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_common_specs(n_planes, TR) + [
            pl.BlockSpec((rows, TR), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ] + pb_in + [
            pl.BlockSpec(memory_space=pl.ANY),
        ] + lab_in,
        out_specs=pl.BlockSpec((_NROWS, TR), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_NROWS, n_tiles * TR), jnp.float32),
        scratch_shapes=[
            _win_scratch(vol, ky, zw, blend, resident),
        ] + lab_scratch + [
            pltpu.VMEM((8, TR), jnp.float32),
            _win_sems(),
        ] + lab_sems,
        interpret=interpret,
        **_vmem_params(resident, vol, lab if n_ch is not None else None),
    )(*args)


def _bwd_vol_call(vol, rays_tiled, starts, g_tiled, lab, *, n_tiles,
                  TR, n_planes, h, ky, zw, zc, precision, blend, n_ch,
                  resident, interpret, pbest=None):
    # The volume-gradient kernel always streams windows: its read-modify-
    # write target is the f32 gradient volume, which at resident-worthy
    # volume sizes does not fit VMEM.
    del resident
    mip = pbest is not None
    kernel = functools.partial(
        _bwd_vol_kernel, h=h, ky=ky, zw=zw, zc=zc, precision=precision,
        blend=blend, n_ch=n_ch, mip=mip,
    )
    xp = 2 if blend else 1
    rows = 1 if n_ch is None else -(-n_ch // 8) * 8
    dvol_init = jnp.zeros(vol.shape, jnp.float32)
    pb_in = [pl.BlockSpec((1, TR), lambda t: (0, t),
                          memory_space=pltpu.VMEM)] if mip else []
    lab_in = [] if n_ch is None else [pl.BlockSpec(memory_space=pl.ANY)]
    lab_scratch = [] if n_ch is None else [
        pltpu.VMEM((2, xp, ky, zw), lab.dtype)]
    lab_sems = [] if n_ch is None else [pltpu.SemaphoreType.DMA((2,))]
    args = (starts, rays_tiled, g_tiled) + (
        (pbest,) if mip else ()) + (vol,) + (
        () if n_ch is None else (lab,)) + (dvol_init,)
    alias_idx = (4 if n_ch is None else 5) + (1 if mip else 0)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_common_specs(n_planes, TR) + [
            pl.BlockSpec((rows, TR), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ] + pb_in + [
            pl.BlockSpec(memory_space=pl.ANY),  # fwd volume (unused)
        ] + lab_in + [
            pl.BlockSpec(memory_space=pl.ANY),  # dvol accumulator (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(vol.shape, jnp.float32),
        input_output_aliases={alias_idx: 0},
        scratch_shapes=[
            pltpu.VMEM((2, xp, ky, zw), jnp.float32),
            pltpu.VMEM((2, xp, ky, zw), jnp.float32),
        ] + lab_scratch + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + lab_sems,
        interpret=interpret,
    )(*args)


def _resolve_resident(resident, volume, axis, ky, zw, blend, storage,
                      mask=None, prepped_vol=None):
    """Auto-pick VMEM residency: fit the (padded) volume [+ labelmap] in the
    VMEM scratch budget. ``False`` forces streaming; ``True`` requests
    residency but is still clamped by the hard VMEM fit (a non-fitting
    volume cannot be resident — it would fail to allocate, e.g. for the
    non-marching branches of the auto-axis ``lax.switch``)."""
    if resident is not None and not resident:
        return False
    itm = 2 if storage == "bf16" else jnp.dtype(volume.dtype).itemsize
    if prepped_vol is not None and prepped_vol.ndim == 3:
        need = prepped_vol.nbytes
    else:
        need = _resident_bytes(volume.shape, axis, ky, zw, blend, itm)
    if mask is not None:
        mitm = 2 if storage == "bf16" else jnp.dtype(mask.dtype).itemsize
        need += _resident_bytes(volume.shape, axis, ky, zw, blend, mitm)
    return need <= _RESIDENT_BUDGET


def _tile_permutes(perm, B, N, TR, n_tiles_img, n_ch=None):
    """Vectorized tiled-order <-> row-major maps for outputs/cotangents.

    Scalar mode maps (1, cols) <-> (B, 1, N); channel mode maps
    (C_pad, cols) <-> (B, n_ch, N). ``perm`` may be a tile-subset
    permutation (sparse rendering): un-rendered rays untile to 0 and send
    0 cotangents to the kernel.
    """
    perm_j = jnp.asarray(perm)
    safe = jnp.maximum(perm_j, 0)
    n_cols = perm.shape[0]  # n_tiles_packed * TR (== n_tiles_img*TR dense)
    del n_tiles_img
    inv = np.full(N, -1, np.int64)
    inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
    sparse = bool((inv < 0).any())
    inv_pad = np.asarray(inv < 0)
    inv_j = jnp.asarray(np.maximum(inv, 0))
    rows = 1 if n_ch is None else -(-n_ch // 8) * 8

    def untile(out_tiled):
        if n_ch is None:
            out_tiled = out_tiled.reshape(B, n_cols)
            out = out_tiled[:, inv_j]
            if sparse:
                out = jnp.where(inv_pad[None, :], 0.0, out)
            return out[:, None, :]
        out_tiled = out_tiled.reshape(rows, B, n_cols)
        out = out_tiled[:, :, inv_j]  # (rows, B, N)
        if sparse:
            out = jnp.where(inv_pad[None, None, :], 0.0, out)
        return jnp.moveaxis(out, 0, 1)[:, :n_ch, :]

    def tile_g(g):
        if n_ch is None:
            g2 = g.reshape(B, N)
            out = g2[:, safe]  # (B, packed)
            out = jnp.where(perm_j[None, :] >= 0, out, 0.0)
            return out.reshape(1, -1)
        g3 = jnp.moveaxis(g.reshape(B, n_ch, N), 1, 0)  # (n_ch, B, N)
        if rows != n_ch:
            g3 = jnp.pad(g3, ((0, rows - n_ch), (0, 0), (0, 0)))
        out = g3[:, :, safe]  # (rows, B, packed)
        out = jnp.where(perm_j[None, None, :] >= 0, out, 0.0)
        return out.reshape(rows, -1)

    return untile, tile_g




def _padded_transverse(dims, axis, ky, zw):
    """(Yp, Zp) extents of the permuted volume AFTER _prep_vol padding."""
    other = tuple(d for d in range(3) if d != axis)
    Yp = max(dims[other[0]], ky)
    Zp = max(-(-dims[other[1]] // 128) * 128, zw)
    return Yp, Zp


def _int_zeros_cotangent(x):
    """float0 cotangent for an integer-dtype primal (custom_vjp contract)."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.lru_cache(maxsize=64)
def _make_joseph(dims, image_shape, axis, h, n_steps, voxel_shift, eps, tile,
                 ky, zw, zc, precision, storage, interpret,
                 use_prepped=False, n_ch=None, resident=False, reduce="sum",
                 tile_subset=None, fused=True):
    """Build the custom-VJP render core for one static configuration.

    The VJP boundary sits at PRE-PACKED tiled rays:
    ``core(volume, rays_tiled, starts, prepped, mask) -> (B, C, N)`` in
    row-major detector order. Ray packing (``_prep_rays``, differentiable
    XLA) and window planning (``_compute_starts``, integer tables) run in
    the caller — ONCE per render, shared with the footprint-fit guard, and
    XLA autodiff chains the returned ``rays_tiled`` cotangent back to
    (source, target, weights) through the packing (its tile gather carries
    an exact inverse-permutation VJP, no scatter).

    ``h`` is the (possibly fractional) marching stride in planes; sampling
    positions along the axis are ``p * h`` for ``p in [0, n_steps)``. Integer
    ``h`` uses single-plane windows; fractional ``h`` lerps plane pairs.

    ``use_prepped``: ``prepped`` carries the already permuted/padded/cast
    volume (the DRR caches one per axis) and ``_prep_vol`` is skipped.
    Gradients are still attributed to the raw ``volume`` argument (the
    caller maintains ``prepped == _prep_vol(volume)``); the ``prepped``
    cotangent is symbolic zero.

    ``n_ch``: per-structure channel rendering (reference renderers.py:74-89):
    each sample's contribution lands in the channel given by its
    nearest-voxel label in the mask argument; output is (B, n_ch, N).

    ``reduce="max"`` (MIP): the forward kernel tracks each ray's argmax
    plane alongside the running maximum; backward runs the SAME analytic
    kernels gated to that plane (max's subgradient), staying on the kernel
    path end to end (reference semantics: renderers.py:175-183). First
    maximum wins on exact ties — measure-zero at generic poses.

    ``tile_subset`` (sparse rendering, reference detector.py:134-137): only
    the listed detector tiles are packed and rendered; the row-major output
    is 0 at un-rendered rays (the caller gathers the sampled subset).
    CACHE INVARIANT: ``tile_subset`` is part of this lru key, so every
    distinct occupied-tile set is a fresh Pallas compile (20-90 s via the
    remote compile server). That is safe ONLY because subsampling is drawn
    once at Detector construction (detector.py ``n_subsample``) and the
    occupied-tile set is therefore fixed for the life of the DRR. If
    per-call resampling (the reference's per-forward randperm) is ever
    added, do NOT thread the fresh subset through here — key the kernel on
    ``len(tile_subset)`` only and pass the tile indices as a runtime array
    (prefetched scalar), or the "tiles" strategy will recompile every
    iteration and churn this 64-entry cache.
    """
    H, W = image_shape
    other = tuple(d for d in range(3) if d != axis)
    perm3 = (axis,) + other
    inv_perm3 = tuple(np.argsort(perm3))
    blend = abs(h - round(h)) > 1e-9
    xpad = 1 if blend else 0
    TR = tile * tile
    perm, n_tiles_img = _subset_perm(H, W, tile, tile_subset)
    padded = perm.shape[0]  # packed columns per batch element
    N = H * W
    mip = reduce == "max"

    kw = dict(TR=TR, n_planes=n_steps, h=h, ky=ky, zw=zw, zc=zc,
              precision=precision, blend=blend, n_ch=n_ch,
              resident=resident, interpret=interpret)

    def _vols(volume, prepped, mask):
        vol = prepped if use_prepped else _prep_vol(
            volume, perm3, ky, zw, storage, xpad)
        lab = (None if n_ch is None
               else _prep_vol(mask, perm3, ky, zw, storage, xpad))
        return vol, lab

    def _run_fwd(vol, lab, rays_tiled, starts, B):
        n_tiles = rays_tiled.shape[1] // TR
        if (not resident and not blend and not mip and n_ch is None
                and abs(h - round(h)) < 1e-9):
            # Streaming scalar sum-reduce: plane-major marching streams
            # each volume plane once instead of ~n_tiles small window DMAs
            # per plane (see _fwd_plane_major_kernel).
            out = _fwd_plane_major_call(
                vol, rays_tiled, starts, n_tiles=n_tiles, TR=TR,
                n_planes=n_steps, h=h, ky=ky, zw=zw, zc=zc,
                precision=precision, interpret=interpret)
            untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img, None)
            return untile(out), None
        out = _fwd_call(vol, rays_tiled, starts, lab,
                        n_tiles=n_tiles, reduce=reduce, **kw)
        untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img, n_ch)
        if mip:
            return untile(out[0:1]), out[1:2]  # (value, argmax plane row)
        return untile(out), None

    @jax.custom_vjp
    def core(volume, rays_tiled, starts, prepped, mask):
        B = rays_tiled.shape[1] // padded
        vol, lab = _vols(volume, prepped, mask)
        out, _ = _run_fwd(vol, lab, rays_tiled, starts, B)
        return out

    def core_fwd(volume, rays_tiled, starts, prepped, mask):
        B = rays_tiled.shape[1] // padded
        vol, lab = _vols(volume, prepped, mask)
        if n_ch is None and fused:
            # Fused value+gradient march (see _fwdgrad_kernel): the value
            # costs nothing extra on top of the gradient terms, so under AD
            # the forward kernel is skipped entirely and the rays backward
            # collapses to `rows * g`.
            n_tiles = rays_tiled.shape[1] // TR
            allrows = _fwdgrad_call(vol, rays_tiled, starts,
                                    n_tiles=n_tiles, reduce=reduce, **kw)
            untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img, None)
            out = untile(allrows[_FG_VAL : _FG_VAL + 1])
            pbest = allrows[_FG_PBEST : _FG_PBEST + 1] if mip else None
            rows = allrows[:7]
            return out, (vol, lab, rays_tiled, starts, pbest, rows)
        out, pbest = _run_fwd(vol, lab, rays_tiled, starts, B)
        # The prepared arrays ride as residuals: backward never re-runs the
        # window-start precompute or the volume transpose.
        return out, (vol, lab, rays_tiled, starts, pbest, None)

    def core_bwd(res, g):
        vol, lab, rays_tiled, starts, pbest, rows = res
        B = rays_tiled.shape[1] // padded
        n_tiles = rays_tiled.shape[1] // TR
        _, tile_g = _tile_permutes(perm, B, N, TR, n_tiles_img, n_ch)
        g_tiled = tile_g(g)

        if rows is not None:
            # Fused path: rows are g-independent; the rays cotangent is an
            # elementwise product (rows _A.._SC, zeros elsewhere — amin/amax
            # enter only through non-differentiable comparisons here).
            d_rays = jnp.concatenate(
                [rows * g_tiled,
                 jnp.zeros((_NROWS - 7, rows.shape[1]), jnp.float32)],
                axis=0)
        else:
            d_rays = _bwd_rays_call(vol, rays_tiled, starts, g_tiled, lab,
                                    n_tiles=n_tiles, pbest=pbest, **kw)
        d_vol_p = _bwd_vol_call(vol, rays_tiled, starts, g_tiled, lab,
                                n_tiles=n_tiles, pbest=pbest, **kw)

        Y0, Z0 = dims[other[0]], dims[other[1]]
        X0 = dims[axis]
        d_vol = jnp.transpose(d_vol_p[:X0, :Y0, :Z0], inv_perm3)
        # Symbolic-zero cotangents for the cache and (integer-valued) mask;
        # float0 for the integer window table.
        d_prepped = (jnp.zeros_like(vol) if use_prepped
                     else jnp.zeros((0,), jnp.float32))
        d_mask = (jnp.zeros(dims, jnp.float32) if n_ch is not None
                  else jnp.zeros((0,), jnp.float32))
        return (d_vol, d_rays, _int_zeros_cotangent(starts), d_prepped,
                d_mask)

    core.defvjp(core_fwd, core_bwd)
    return core


def joseph_pallas_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    image_shape: Tuple[int, int],
    axis: int = 0,
    step: float = 1,
    n_steps: Optional[int] = None,
    voxel_shift: float = 0.5,
    eps: float = 1e-8,
    tile: int = 16,
    ky: int = 64,
    zw: int = 256,
    zc: Optional[int] = None,
    precision: str = "f32",
    storage: Optional[str] = None,
    interpret: bool = False,
    prepped_vol: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    n_channels: Optional[int] = None,
    resident: Optional[bool] = None,
    reducefn: str = "sum",
    footprint_guard: bool = False,
    guard_pred=None,
    fallback=None,
    tile_subset=None,
    fused_pose_bwd: bool = True,
) -> jnp.ndarray:
    """Joseph plane-march render via Pallas TPU kernels, fwd + analytic bwd.

    Args mirror :func:`diffdrr_tpu.ops.joseph.joseph_raycast`, plus:

      image_shape: static detector (H, W) — rays must be in row-major detector
        order (the DRR orchestrator's native layout).
      step: marching stride in planes. Integer strides sample exactly at
        voxel planes (classic Joseph); fractional strides lerp between the
        two bracketing planes (the trilinear ray-march mode, see
        ops/pallas/raymarch.py).
      n_steps: number of marching steps (default: cover the whole axis).
      tile: detector tile side in pixels (TR = tile**2 rays per kernel step).
      ky / zw: static VMEM window extents along the two transverse volume
        axes; ky is 16-aligned, zw 128-aligned (HBM tile grid). Must cover one
        tile's in-plane footprint plus alignment slack (127 along z) — the
        DRR orchestrator derives them from its geometry.
      mask / n_channels: per-structure channel rendering — each sample lands
        in the channel of its nearest-voxel label (reference
        renderers.py:74-89); output becomes (B, n_channels, N).
      resident: keep the whole volume (and labelmap) VMEM-resident in the
        fwd/bwd-rays kernels instead of streaming per-plane windows — ~2x
        kernel speedup when it fits (default: auto by VMEM budget).
      footprint_guard / guard_pred / fallback: runtime dispatch guard.
        ``footprint_guard=True`` computes the exact per-(tile, plane)
        window-fit bit in the SAME plane scan that places the windows
        (zero extra passes) and ANDs it with the optional scalar
        ``guard_pred``; poses that fail render through
        ``fallback(volume, source, target, weights)`` instead of silently
        clipping peripheral samples. Requires ``fallback``.
      tile_subset: static tuple of detector-tile indices — only these tiles
        are packed/rendered (true sparse rendering for ``p_subsample``,
        reference detector.py:134-137); un-rendered rays output 0.
      fused_pose_bwd: under ``jax.grad``, run the fused value+gradient
        forward march (``_fwdgrad_kernel``) so the rays backward becomes an
        elementwise product instead of a second march — the right default
        for pose-gradient workloads. Pass False when differentiating ONLY
        the density (the fused rows would be dead weight). Scalar mode
        only; plain (undifferentiated) forwards always use the lean kernel.

    Returns (B, 1, N) line integrals ((B, C, N) with a mask). Differentiable
    w.r.t. volume, source, target, and weights (analytic VJP kernels,
    including ``reducefn="max"`` via in-kernel argmax gating; the
    volume-gradient pass is dead-code-eliminated when only pose gradients
    are required).
    """
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)
    if zc is None:
        zc = zw - 128 if zw > 128 else zw
    _validate_z_window(volume.shape, axis, zw, zc)
    h = float(step)
    if n_steps is None:
        n_steps = int(-(-volume.shape[axis] // h))
    use_prepped = prepped_vol is not None
    n_ch = int(n_channels) if mask is not None else None
    if reducefn not in ("sum", "max"):
        raise ValueError(
            f"kernel path supports reducefn 'sum'/'max', got {reducefn!r}; "
            f"use the XLA renderer for custom reductions")
    if n_ch is not None:
        reducefn = "sum"  # channel renders always scatter-sum (reference
        #                   ignores reducefn when a mask is given)
    blend = abs(h - round(h)) > 1e-9
    resident = _resolve_resident(resident, volume, axis, ky, zw, blend,
                                 storage, mask, prepped_vol)
    dims = volume.shape
    other = tuple(d for d in range(3) if d != axis)
    perm3 = (axis,) + other
    H, W = image_shape
    if tile_subset is not None:
        tile_subset = tuple(int(t) for t in tile_subset)
    _, n_tiles_packed = _subset_perm(H, W, tile, tile_subset)
    TR = tile * tile
    Yp, Zp = _padded_transverse(dims, axis, ky, zw)

    if (footprint_guard or guard_pred is not None) and fallback is None:
        raise ValueError("footprint_guard/guard_pred require a fallback")

    rays_tiled = _prep_rays(source, target, weights, perm3, dims, H, W,
                            tile, voxel_shift, h, eps,
                            tile_subset=tile_subset)
    ret = _compute_starts(
        rays_tiled, B * n_tiles_packed, TR, int(n_steps), h, Yp, Zp, ky, zw,
        zc, with_fit=footprint_guard,
        y0=dims[other[0]], z0=dims[other[1]],
    )
    starts, fits = ret if footprint_guard else (ret, None)

    core = _make_joseph(
        dims, tuple(image_shape), axis, h, int(n_steps), voxel_shift,
        eps, tile, ky, zw, zc, precision, storage, interpret, use_prepped,
        n_ch, resident, reducefn,
        # Only passed when sparse: keeps the factory signature stable for
        # callers/tests that stub it (and the lru key small) on the dense
        # path.
        **({} if tile_subset is None else {"tile_subset": tile_subset}),
        **({} if fused_pose_bwd else {"fused": False}),
    )
    prepped = prepped_vol if use_prepped else jnp.zeros((0,), jnp.float32)
    lab = mask if mask is not None else jnp.zeros((0,), jnp.float32)

    pred = fits
    if guard_pred is not None:
        pred = guard_pred if pred is None else (pred & guard_pred)
    if pred is None:
        return core(volume, rays_tiled, starts, prepped, lab)
    return jax.lax.cond(
        pred,
        lambda op: core(op[0], op[1], op[2], prepped, lab),
        lambda op: fallback(op[0], op[3], op[4], op[5]),
        (volume, rays_tiled, starts, source, target, weights),
    )
