"""Pallas TPU kernels: exact Siddon ray integration via slab marching.

TPU-native replacement for the reference's sort-based Siddon renderer
(diffdrr/renderers.py:94-113). Instead of materializing and sorting every
ray's plane crossings (O(D log D) per ray and the memory wall that forced the
reference's ``patch_size``), this kernel marches the major axis one voxel
slab at a time. Within a slab the ray crosses at most one transverse y-plane
and one z-plane (the major axis has the largest |direction| component), so the
slab contributes at most three exact sub-segments whose nearest-neighbor
voxels lie in a 2x2 in-plane neighborhood:

    contribution = sum_j len_j * V[s, y_j, z_j]
                 = sum_{m,n} C[m,n] * V[s, m, n],   C 2x2 with <= 3 nonzeros

Any 2x2 C splits column-wise into two rank-1 terms, so the kernel reuses the
Joseph machinery (diffdrr_tpu/ops/pallas/joseph.py) with two one-hot
z-contractions per slab instead of one tent contraction — still matmuls, no
gathers, no sorts.

Validity domain: the "at most one transverse crossing per slab" decomposition
requires every ray's transverse direction components to satisfy
``max(|dy|, |dz|) <= |dx|`` for the chosen march axis. The DRR orchestrator
guards dispatch accordingly (see DRR.pallas_ray_compatibility /
DRR.diagnose_pose).

Gradients match the reference's semantics: nearest-neighbor sampling has zero
gradient through voxel *values* w.r.t. pose; pose gradients flow through the
exact segment *lengths* (the alpha breakpoints), and density gradients through
the segment-length weights. Both are computed analytically in backward
kernels with the same slab loop. The forward saves the prepared
(vol, rays, starts) as VJP residuals, so backward never re-runs the prep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .joseph import (
    _NROWS,
    _A,
    _B,
    _GY,
    _DY,
    _GZ,
    _DZ,
    _SC,
    _AMIN,
    _AMAX,
    _common_specs,
    _compute_starts,
    _plan_tiles_cached,
    _prep_rays,
    _prep_vol,
    _ray_rows,
    _read_range,
    _rmw_double_buffered,
    _resolve_resident,
    _roll_window,
    _subset_perm,
    _tile_permutes,
    _vmem_params,
    _win_scratch,
    _win_sems,
    _window_reader,
    _dot,
)

__all__ = ["siddon_pallas_raycast"]


def _slab_segments(r, s, starts_ref, seg_gates=None, window_origin=None):
    """Exact Siddon decomposition of slab ``s`` for every ray in the tile.

    Returns (C00, C01, C10, C11, ry0, rz0, aux) where C are segment-length
    weights (ray weight folded in), (ry0, rz0) the window-relative base voxel
    indices, and aux carries intermediates reused by the backward kernel.
    All arrays are (1, TR). ``seg_gates`` (3 x (1, TR), optional) multiplies
    each segment's weight — the MIP backward gates all but the argmax
    segment to zero.
    """
    a, b = r["a"], r["b"]
    gy, dy, gz, dz = r["gy"], r["dy"], r["gz"], r["dz"]
    w = r["sc"]
    sf = s.astype(jnp.float32)

    a1 = (sf - 0.5) * a + b
    a2 = (sf + 0.5) * a + b
    alo = jnp.minimum(a1, a2)
    ahi = jnp.maximum(a1, a2)
    alo = jnp.maximum(alo, r["amin"])
    ahi_raw = jnp.minimum(ahi, r["amax"])
    ahi = jnp.maximum(ahi_raw, alo)  # empty intersection -> zero-length slab

    def crossings(g, d):
        p_lo = g + alo * d
        p_hi = g + ahi * d
        m_lo = jnp.round(p_lo)
        m_hi = jnp.round(p_hi)
        base = jnp.minimum(m_lo, m_hi)
        crossed = m_lo != m_hi
        bound = jnp.maximum(m_lo, m_hi) - 0.5
        ac = (bound - g) / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
        t = jnp.where(crossed, jnp.clip(ac, alo, ahi), alo)
        return base, t

    y0, ty = crossings(gy, dy)
    z0, tz = crossings(gz, dz)

    t1 = jnp.minimum(ty, tz)
    t2 = jnp.maximum(ty, tz)
    len1 = t1 - alo
    len2 = t2 - t1
    len3 = ahi - t2
    mids = [(alo + t1) * 0.5, (t1 + t2) * 0.5, (t2 + ahi) * 0.5]
    lens = [len1, len2, len3]

    C = [[jnp.zeros_like(alo) for _ in range(2)] for _ in range(2)]
    seg_sel = []  # (iy, iz) one-hot floats per segment, for the backward
    for j, (mid, length) in enumerate(zip(mids, lens)):
        iy = jnp.round(gy + mid * dy) - y0  # 0.0 or 1.0
        iz = jnp.round(gz + mid * dz) - z0
        iy = jnp.clip(iy, 0.0, 1.0)
        iz = jnp.clip(iz, 0.0, 1.0)
        seg_sel.append((iy, iz))
        lw = length * w
        if seg_gates is not None:
            lw = lw * seg_gates[j]
        C[0][0] += lw * (1 - iy) * (1 - iz)
        C[1][0] += lw * iy * (1 - iz)
        C[0][1] += lw * (1 - iy) * iz
        C[1][1] += lw * iy * iz

    if window_origin is None:
        ys = starts_ref[0, s, 0].astype(jnp.float32)
        zs = (starts_ref[0, s, 1] + starts_ref[0, s, 2]).astype(jnp.float32)
    else:  # plane-major: the caller reads its own starts layout
        ys, zs = window_origin
    aux = dict(
        alo=alo, ahi=ahi, ahi_raw=ahi_raw, a1=a1, a2=a2, ty=ty, tz=tz,
        t1=t1, t2=t2, y0=y0, z0=z0, seg_sel=seg_sel, lens=lens,
    )
    return C, y0 - ys, z0 - zs, aux


def _onehot(iota, pos):
    return (jnp.abs(iota - pos) < 0.5).astype(jnp.float32)


def _paired_onehots(iota_y2, iota_z2, ry0, rz0):
    """Doubled-width one-hot operands for the fused corner contraction.

    Builds directly at (KY, 2*TR) / (ZC, 2*TR) width — a broadcast against a
    concatenated (1, 2*TR) position row — instead of building two halves and
    concatenating (saves the VPU copy per slab step). Returns:
      wz  = [onehot(rz0) | onehot(rz0+1)]   (ZC, 2TR) matmul RHS
      ey2 = [onehot(ry0) | onehot(ry0+1)]   (KY, 2TR)
      eyr = [onehot(ry0+1) | onehot(ry0)]   (KY, 2TR) (lane roll of ey2)
    """
    tr = ry0.shape[1]
    wz = _onehot(iota_z2, jnp.concatenate([rz0, rz0 + 1.0], axis=1))
    ey2 = _onehot(iota_y2, jnp.concatenate([ry0, ry0 + 1.0], axis=1))
    eyr = pltpu.roll(ey2, tr, axis=1)
    return wz, ey2, eyr


def _corner_values(win, wz, ey2, eyr, precision):
    """All four 2x2 corner values per ray from ONE MXU contraction.

    tAB = win @ wz = [tA | tB]; with ey2/eyr as above, two double-width
    row reductions give [v00 | v11] and [v10 | v01].
    """
    tr = ey2.shape[1] // 2
    tAB = _dot(win, wz, (((1,), (0,)), ((), ())), precision)  # (KY, 2TR)
    vA = jnp.sum(ey2 * tAB, axis=0, keepdims=True)  # [v00 | v11]
    vB = jnp.sum(eyr * tAB, axis=0, keepdims=True)  # [v10 | v01]
    v00, v11 = vA[:, :tr], vA[:, tr:]
    v10, v01 = vB[:, :tr], vB[:, tr:]
    return v00, v01, v10, v11


def _fwd_kernel(
    starts_ref, rays_ref, vol_ref, out_ref, win_buf, acc_ref, sems,
    *, ky, zw, zc, precision, resident=False, reduce="sum",
):
    tr = rays_ref.shape[1]
    r = _ray_rows(rays_ref)
    iota_y2 = jax.lax.broadcasted_iota(
        jnp.int32, (ky, 2 * tr), 0).astype(jnp.float32)
    iota_z2 = jax.lax.broadcasted_iota(
        jnp.int32, (zc, 2 * tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, 1, ky, zw, False, resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(s, _):
        slot = jax.lax.rem(s - lo, 2)
        win_prefetch(jax.lax.rem(s + 1 - lo, 2), s + 1, hi)

        C, ry0, rz0, aux = _slab_segments(r, s, starts_ref)
        wz, ey2, eyr = _paired_onehots(iota_y2, iota_z2, ry0, rz0)

        win = _roll_window(win_fetch(slot, s)[0], starts_ref[0, s, 2], zc)

        v00, v01, v10, v11 = _corner_values(win, wz, ey2, eyr, precision)
        if reduce == "max":
            # MIP: max over the reference's per-segment contributions
            # (length x ray-weight x nearest voxel value). The oracle's sort
            # always carries zero-length boundary entries, so the 0 init
            # agrees with it. Rows: [0] running max, [1] argmax encoded as
            # slab*4 + segment (backward gates on it; first maximum wins on
            # exact ties — measure-zero at generic poses).
            w = r["sc"]
            sf = s.astype(jnp.float32)
            for j, ((iy, iz), length) in enumerate(
                    zip(aux["seg_sel"], aux["lens"])):
                v_seg = (v00 * (1 - iy) * (1 - iz) + v10 * iy * (1 - iz)
                         + v01 * (1 - iy) * iz + v11 * iy * iz)
                val = length * w * v_seg
                better = val > acc_ref[0:1, :]
                acc_ref[1:2, :] = jnp.where(
                    better, sf * 4.0 + j, acc_ref[1:2, :])
                acc_ref[0:1, :] = jnp.where(better, val, acc_ref[0:1, :])
        else:
            acc_ref[...] += (
                C[0][0] * v00 + C[1][0] * v10 + C[0][1] * v01 + C[1][1] * v11
            )
        return ()

    if reduce == "max":
        # Argmax row init -1: rays that never beat 0 gate backward off.
        acc_ref[1:2, :] = jnp.full_like(acc_ref[1:2, :], -1.0)
    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    out_ref[...] = acc_ref[...]


def _bwd_rays_kernel(
    *refs, ky, zw, zc, precision, resident=False, mip=False,
):
    """d(loss)/d(packed rays) for exact Siddon.

    out = w * sum_j len_j V_j with len breakpoints (alo, t1, t2, ahi):
      d out/d t1 = w (V1 - V2); d/d t2 = w (V2 - V3)
      d out/d alo = -w V1;      d/d ahi = +w V3
    chained through the clip/min/max selections to the alpha parameters and
    through them to (a, b, gy, dy, gz, dz). Voxel values are constant w.r.t.
    pose under nearest sampling (zero gradient), matching the reference.

    ``mip=True`` (reducefn="max"): an extra (1, TR) input carries the
    forward argmax (slab*4 + segment); gating V_j by its segment selector
    turns the five breakpoint formulas above into exactly max's
    subgradient — d(len_j* w V_j*) — with the same downstream routing.
    """
    if mip:
        (starts_ref, rays_ref, g_ref, pbest_ref, vol_ref, dout_ref,
         win_buf, acc_ref, sems) = refs
    else:
        (starts_ref, rays_ref, g_ref, vol_ref, dout_ref,
         win_buf, acc_ref, sems) = refs
    tr = rays_ref.shape[1]
    r = _ray_rows(rays_ref)
    iota_y2 = jax.lax.broadcasted_iota(
        jnp.int32, (ky, 2 * tr), 0).astype(jnp.float32)
    iota_z2 = jax.lax.broadcasted_iota(
        jnp.int32, (zc, 2 * tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, 1, ky, zw, False, resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)

    acc_ref[...] = jnp.zeros_like(acc_ref)  # rows: a b gy dy gz dz sc pad

    def body(s, _):
        slot = jax.lax.rem(s - lo, 2)
        win_prefetch(jax.lax.rem(s + 1 - lo, 2), s + 1, hi)

        C, ry0, rz0, aux = _slab_segments(r, s, starts_ref)
        wz, ey2, eyr = _paired_onehots(iota_y2, iota_z2, ry0, rz0)

        win = _roll_window(win_fetch(slot, s)[0], starts_ref[0, s, 2], zc)

        # Corner values V[y0+i, z0+j] per ray (see _corner_values).
        v00, v01, v10, v11 = _corner_values(win, wz, ey2, eyr, precision)

        # Per-segment values via the (iy, iz) selectors.
        Vs = []
        for iy, iz in aux["seg_sel"]:
            Vs.append(
                v00 * (1 - iy) * (1 - iz) + v10 * iy * (1 - iz)
                + v01 * (1 - iy) * iz + v11 * iy * iz
            )
        V1, V2, V3 = Vs
        w = r["sc"]

        if mip:
            sf4 = s.astype(jnp.float32) * 4.0
            pb = pbest_ref[0:1, :]
            V1 = V1 * (pb == sf4).astype(jnp.float32)
            V2 = V2 * (pb == sf4 + 1.0).astype(jnp.float32)
            V3 = V3 * (pb == sf4 + 2.0).astype(jnp.float32)

        d_t1 = w * (V1 - V2)
        d_t2 = w * (V2 - V3)
        d_alo = -w * V1
        d_ahi = w * V3

        # t1 = min(ty, tz), t2 = max(ty, tz)
        ty, tz = aux["ty"], aux["tz"]
        ty_is_min = (ty <= tz).astype(jnp.float32)
        d_ty = d_t1 * ty_is_min + d_t2 * (1 - ty_is_min)
        d_tz = d_t1 * (1 - ty_is_min) + d_t2 * ty_is_min

        # t = clip(alpha_cross, alo, ahi) (or alo when no crossing):
        # pass-through to alpha_cross only on the interior branch; clipped
        # branches route to alo / ahi.
        alo, ahi = aux["alo"], aux["ahi"]

        def route(t, d_t, g_pos, d_pos):
            interior = ((t > alo) & (t < ahi)).astype(jnp.float32)
            at_hi = (t >= ahi).astype(jnp.float32)
            at_lo = 1.0 - interior - at_hi
            # alpha_cross = (bound - g)/d: d/dg = -1/d; d/dd = -(alpha)/d
            safe_d = jnp.where(jnp.abs(d_pos) < 1e-20, 1e-20, d_pos)
            d_g = d_t * interior * (-1.0 / safe_d)
            d_d = d_t * interior * (-t / safe_d)
            return d_g, d_d, d_t * at_lo, d_t * at_hi

        d_gy_c, d_dy_c, d_alo_y, d_ahi_y = route(ty, d_ty, r["gy"], r["dy"])
        d_gz_c, d_dz_c, d_alo_z, d_ahi_z = route(tz, d_tz, r["gz"], r["dz"])
        d_alo_tot = d_alo + d_alo_y + d_alo_z
        d_ahi_tot = d_ahi + d_ahi_y + d_ahi_z

        # alo routes to the slab plane (a1/a2) when interior, else to the
        # volume-entry alpha amin; ahi likewise to amax. These boundary
        # terms are the integral's -V(entry) d(amin) + V(exit) d(amax)
        # components — the oracle and the reference both carry them, so
        # dropping them biased pose gradients whenever the volume boundary
        # is not air. Empty slabs (ahi clamped to alo) route their d_ahi
        # through alo's chain, cancelling d_alo exactly.
        a1, a2 = aux["a1"], aux["a2"]
        empty = (aux["ahi_raw"] < aux["alo"]).astype(jnp.float32)
        d_alo_eff = d_alo_tot + empty * d_ahi_tot
        d_ahi_eff = (1.0 - empty) * d_ahi_tot
        lo_is_a1 = (a1 <= a2).astype(jnp.float32)
        lo_interior = (aux["alo"] > r["amin"]).astype(jnp.float32)
        hi_interior = (aux["ahi_raw"] < r["amax"]).astype(jnp.float32)
        sf = s.astype(jnp.float32)
        # a1 = (s-0.5) a + b ; a2 = (s+0.5) a + b
        d_a1 = d_alo_eff * lo_is_a1 * lo_interior + d_ahi_eff * (1 - lo_is_a1) * hi_interior
        d_a2 = d_alo_eff * (1 - lo_is_a1) * lo_interior + d_ahi_eff * lo_is_a1 * hi_interior

        acc_ref[0:1, :] += d_a1 * (sf - 0.5) + d_a2 * (sf + 0.5)
        acc_ref[1:2, :] += d_a1 + d_a2
        acc_ref[2:3, :] += d_gy_c
        acc_ref[3:4, :] += d_dy_c
        acc_ref[4:5, :] += d_gz_c
        acc_ref[5:6, :] += d_dz_c
        # d/dw: the plain segment-value sum.
        acc_ref[6:7, :] += V1 * aux["lens"][0] + V2 * aux["lens"][1] + V3 * aux["lens"][2]
        # Boundary cotangents (clamped branches).
        acc_ref[7:8, :] += d_alo_eff * (1.0 - lo_interior)
        acc_ref[8:9, :] += d_ahi_eff * (1.0 - hi_interior)
        return ()

    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    g = g_ref[0:1, :]
    dout_ref[...] = jnp.zeros_like(dout_ref)
    dout_ref[_A : _A + 1, :] = acc_ref[0:1, :] * g
    dout_ref[_B : _B + 1, :] = acc_ref[1:2, :] * g
    dout_ref[_GY : _GY + 1, :] = acc_ref[2:3, :] * g
    dout_ref[_DY : _DY + 1, :] = acc_ref[3:4, :] * g
    dout_ref[_GZ : _GZ + 1, :] = acc_ref[4:5, :] * g
    dout_ref[_DZ : _DZ + 1, :] = acc_ref[5:6, :] * g
    dout_ref[_SC : _SC + 1, :] = acc_ref[6:7, :] * g
    dout_ref[_AMIN : _AMIN + 1, :] = acc_ref[7:8, :] * g
    dout_ref[_AMAX : _AMAX + 1, :] = acc_ref[8:9, :] * g


# Fused-output row layout: rows 0..8 = the g-independent gradient terms in
# dout order (_A.._AMAX), row 9 = the rendered value.
_FG_VAL = 9


def _fwdgrad_kernel(
    starts_ref, rays_ref, vol_ref, out_ref, win_buf, acc_ref, sems,
    *, ky, zw, zc, precision, resident=False,
):
    """ONE slab march emitting value AND the g-independent gradient rows.

    Exact-Siddon counterpart of joseph._fwdgrad_kernel (see its docstring
    for the factorization argument): in scalar sum mode the backward kernel
    applies the output cotangent once at the end, so the gradient terms can
    ride along the forward march and the pose backward reduces to
    ``rows * g``. The value is recovered for free from the per-segment
    corner values the gradient already needs:
    ``out = w * (V1 len1 + V2 len2 + V3 len3)`` — algebraically equal to
    the forward kernel's corner-coefficient contraction (summation order
    differs by float rounding only). MIP stays on the two-kernel path.
    """
    tr = rays_ref.shape[1]
    r = _ray_rows(rays_ref)
    iota_y2 = jax.lax.broadcasted_iota(
        jnp.int32, (ky, 2 * tr), 0).astype(jnp.float32)
    iota_z2 = jax.lax.broadcasted_iota(
        jnp.int32, (zc, 2 * tr), 0).astype(jnp.float32)
    win_init, win_prefetch, win_fetch = _window_reader(
        vol_ref, starts_ref, win_buf, sems, 1, ky, zw, False, resident)
    lo, hi = _read_range(starts_ref)

    win_init(lo, hi)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(s, _):
        slot = jax.lax.rem(s - lo, 2)
        win_prefetch(jax.lax.rem(s + 1 - lo, 2), s + 1, hi)

        C, ry0, rz0, aux = _slab_segments(r, s, starts_ref)
        wz, ey2, eyr = _paired_onehots(iota_y2, iota_z2, ry0, rz0)

        win = _roll_window(win_fetch(slot, s)[0], starts_ref[0, s, 2], zc)

        v00, v01, v10, v11 = _corner_values(win, wz, ey2, eyr, precision)

        Vs = []
        for iy, iz in aux["seg_sel"]:
            Vs.append(
                v00 * (1 - iy) * (1 - iz) + v10 * iy * (1 - iz)
                + v01 * (1 - iy) * iz + v11 * iy * iz
            )
        V1, V2, V3 = Vs
        w = r["sc"]

        d_t1 = w * (V1 - V2)
        d_t2 = w * (V2 - V3)
        d_alo = -w * V1
        d_ahi = w * V3

        ty, tz = aux["ty"], aux["tz"]
        ty_is_min = (ty <= tz).astype(jnp.float32)
        d_ty = d_t1 * ty_is_min + d_t2 * (1 - ty_is_min)
        d_tz = d_t1 * (1 - ty_is_min) + d_t2 * ty_is_min

        alo, ahi = aux["alo"], aux["ahi"]

        def route(t, d_t, g_pos, d_pos):
            interior = ((t > alo) & (t < ahi)).astype(jnp.float32)
            at_hi = (t >= ahi).astype(jnp.float32)
            at_lo = 1.0 - interior - at_hi
            safe_d = jnp.where(jnp.abs(d_pos) < 1e-20, 1e-20, d_pos)
            d_g = d_t * interior * (-1.0 / safe_d)
            d_d = d_t * interior * (-t / safe_d)
            return d_g, d_d, d_t * at_lo, d_t * at_hi

        d_gy_c, d_dy_c, d_alo_y, d_ahi_y = route(ty, d_ty, r["gy"], r["dy"])
        d_gz_c, d_dz_c, d_alo_z, d_ahi_z = route(tz, d_tz, r["gz"], r["dz"])
        d_alo_tot = d_alo + d_alo_y + d_alo_z
        d_ahi_tot = d_ahi + d_ahi_y + d_ahi_z

        a1, a2 = aux["a1"], aux["a2"]
        empty = (aux["ahi_raw"] < aux["alo"]).astype(jnp.float32)
        d_alo_eff = d_alo_tot + empty * d_ahi_tot
        d_ahi_eff = (1.0 - empty) * d_ahi_tot
        lo_is_a1 = (a1 <= a2).astype(jnp.float32)
        lo_interior = (aux["alo"] > r["amin"]).astype(jnp.float32)
        hi_interior = (aux["ahi_raw"] < r["amax"]).astype(jnp.float32)
        sf = s.astype(jnp.float32)
        d_a1 = d_alo_eff * lo_is_a1 * lo_interior + d_ahi_eff * (1 - lo_is_a1) * hi_interior
        d_a2 = d_alo_eff * (1 - lo_is_a1) * lo_interior + d_ahi_eff * lo_is_a1 * hi_interior

        seg_sum = (V1 * aux["lens"][0] + V2 * aux["lens"][1]
                   + V3 * aux["lens"][2])
        acc_ref[0:1, :] += d_a1 * (sf - 0.5) + d_a2 * (sf + 0.5)
        acc_ref[1:2, :] += d_a1 + d_a2
        acc_ref[2:3, :] += d_gy_c
        acc_ref[3:4, :] += d_dy_c
        acc_ref[4:5, :] += d_gz_c
        acc_ref[5:6, :] += d_dz_c
        acc_ref[6:7, :] += seg_sum
        acc_ref[7:8, :] += d_alo_eff * (1.0 - lo_interior)
        acc_ref[8:9, :] += d_ahi_eff * (1.0 - hi_interior)
        acc_ref[_FG_VAL : _FG_VAL + 1, :] += w * seg_sum
        return ()

    jax.lax.fori_loop(lo, hi, body, (), unroll=False)
    out_ref[...] = acc_ref[...]


def _bwd_vol_kernel(
    *refs, ky, zw, zc, precision, mip=False,
):
    # d/d(volume) via the shared double-buffered RMW pipeline
    # (joseph._rmw_double_buffered); slab windows of distinct planes are
    # disjoint, satisfying its disjointness requirement. ``mip=True`` gates
    # every segment but the forward argmax (slab*4 + segment) to zero.
    if mip:
        (starts_ref, rays_ref, g_ref, pbest_ref, vol_ref, dvol_in_ref,
         dvol_ref, win_buf, dwin_buf, sems, store_sems) = refs
    else:
        (starts_ref, rays_ref, g_ref, vol_ref, dvol_in_ref, dvol_ref,
         win_buf, dwin_buf, sems, store_sems) = refs
    del vol_ref
    tr = rays_ref.shape[1]
    r = _ray_rows(rays_ref)
    iota_y2 = jax.lax.broadcasted_iota(
        jnp.int32, (ky, 2 * tr), 0).astype(jnp.float32)
    iota_z2 = jax.lax.broadcasted_iota(
        jnp.int32, (zc, 2 * tr), 0).astype(jnp.float32)
    g = g_ref[0:1, :]
    g2 = jnp.concatenate([g, g], axis=1)  # (1, 2TR)
    lo, hi = _read_range(starts_ref)

    def load_dma(slot, s):
        ys = pl.multiple_of(starts_ref[0, s, 0], 16)
        zs = pl.multiple_of(starts_ref[0, s, 1], 128)
        return pltpu.make_async_copy(
            dvol_ref.at[pl.ds(s, 1), pl.ds(ys, ky), pl.ds(zs, zw)],
            win_buf.at[slot], sems.at[slot],
        )

    def store_dma(slot, s):
        ys = pl.multiple_of(starts_ref[0, s, 0], 16)
        zs = pl.multiple_of(starts_ref[0, s, 1], 128)
        return pltpu.make_async_copy(
            dwin_buf.at[slot],
            dvol_ref.at[pl.ds(s, 1), pl.ds(ys, ky), pl.ds(zs, zw)],
            store_sems.at[slot],
        )

    def compute_dwin(s):  # -> (1, KY, ZW), this slab's gradient window
        gates = None
        if mip:
            sf4 = s.astype(jnp.float32) * 4.0
            pb = pbest_ref[0:1, :]
            gates = [(pb == sf4 + j).astype(jnp.float32) for j in range(3)]
        C, ry0, rz0, _ = _slab_segments(r, s, starts_ref, seg_gates=gates)
        wz, ey2, eyr = _paired_onehots(iota_y2, iota_z2, ry0, rz0)

        # wyA @ wzA^T + wyB @ wzB^T as ONE contraction over the doubled ray
        # axis: wy2 @ wz^T with wy2 = [wyA | wyB]. With ey2 = [ey0 | ey1]
        # and eyr = [ey1 | ey0],
        #   wy2 = (ca * ey2 + cb * eyr) * g2, ca = [C00 | C11], cb = [C10 | C01]
        ca = jnp.concatenate([C[0][0], C[1][1]], axis=1)  # (1, 2TR)
        cb = jnp.concatenate([C[1][0], C[0][1]], axis=1)
        wy2 = (ca * ey2 + cb * eyr) * g2
        dwin = _dot(wy2, wz, (((1,), (1,)), ((), ())), precision)
        if zc != zw:
            dwin = jnp.pad(dwin, ((0, 0), (0, zw - zc)))
            dwin = pltpu.roll(dwin, starts_ref[0, s, 2], axis=1)
        return dwin[None]

    _rmw_double_buffered(lo, hi, load_dma, store_dma, win_buf, dwin_buf,
                         compute_dwin)


# =============================================================================
# Wrapper + custom VJP
# =============================================================================


def _fwd_plane_major_kernel(
    starts_ref, starts0_ref, rays_ref, plane_ref, out_ref, acc_ref,
    *, ky, zw, zc, precision, n_tiles, TR,
):
    """Plane-major streaming exact-Siddon forward (sum reduce).

    Same rationale as ``..joseph._fwd_plane_major_kernel``: the grid
    marches slabs and Pallas streams each volume plane into VMEM exactly
    once; per-(tile, slab) windows become VMEM slices and the per-ray
    accumulators persist in scratch across the sequential grid.
    """
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    iota_y2 = jax.lax.broadcasted_iota(
        jnp.int32, (ky, 2 * TR), 0).astype(jnp.float32)
    iota_z2 = jax.lax.broadcasted_iota(
        jnp.int32, (zc, 2 * TR), 0).astype(jnp.float32)

    def tile_body(t, _):
        aux0 = starts0_ref[0, t, 3]
        lo = aux0 // 65536
        hi = jax.lax.rem(aux0, 65536)

        @pl.when(jnp.logical_and(p >= lo, p < hi))
        def _():
            from .joseph import (_A, _AMAX, _AMIN, _B, _DY, _DZ, _GY, _GZ,
                                 _SC)

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
            C, ry0, rz0, _ = _slab_segments(
                r, p, None,
                window_origin=(ys.astype(jnp.float32),
                               (zal + zsh).astype(jnp.float32)))
            wz, ey2, eyr = _paired_onehots(iota_y2, iota_z2, ry0, rz0)
            win = plane_ref[0, pl.ds(pl.multiple_of(ys, 16), ky),
                            pl.ds(pl.multiple_of(zal, 128), zw)]
            win = _roll_window(win, zsh, zc)
            v00, v01, v10, v11 = _corner_values(win, wz, ey2, eyr, precision)
            acc_ref[:, sl] += (C[0][0] * v00 + C[1][0] * v10
                               + C[0][1] * v01 + C[1][1] * v11)

        return ()

    jax.lax.fori_loop(0, n_tiles, tile_body, (), unroll=False)

    @pl.when(p == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _fwd_plane_major_call(vol, rays_tiled, starts, *, n_tiles, TR, n_planes,
                          ky, zw, zc, precision, interpret):
    from .joseph import _NROWS

    Xp, Yp, Zp = vol.shape
    kernel = functools.partial(
        _fwd_plane_major_kernel, ky=ky, zw=zw, zc=zc, precision=precision,
        n_tiles=n_tiles, TR=TR,
    )
    # Plane-major starts layout — see ..joseph._fwd_plane_major_call for
    # the Mosaic block-shape rule this satisfies.
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
            pl.BlockSpec((1, Yp, Zp), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tiles * TR), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TR), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n_tiles * TR), jnp.float32)],
        interpret=interpret,
    )(starts, starts, rays_tiled, vol)


@functools.lru_cache(maxsize=64)
def _make_siddon(dims, image_shape, axis, voxel_shift, eps, tile, ky, zw, zc,
                 precision, storage, interpret, use_prepped=False,
                 resident=False, reduce="sum", tile_subset=None, fused=True):
    """Custom-VJP exact-Siddon render core over PRE-PACKED tiled rays.

    Same boundary as :func:`..joseph._make_joseph`:
    ``core(volume, rays_tiled, starts, prepped) -> (B, 1, N)``; ray packing
    and window planning run once in the caller. ``reduce="max"`` (MIP)
    tracks the argmax (slab*4 + segment) in the forward and runs the same
    analytic backward kernels gated to it. ``tile_subset``: sparse
    rendering — only the listed detector tiles are packed/rendered.
    """
    from .joseph import _int_zeros_cotangent

    H, W = image_shape
    other = tuple(d for d in range(3) if d != axis)
    perm3 = (axis,) + other
    inv_perm3 = tuple(np.argsort(perm3))
    X = dims[axis]
    n_planes = X
    TR = tile * tile
    perm, n_tiles_img = _subset_perm(H, W, tile, tile_subset)
    padded = perm.shape[0]  # packed columns per batch element
    N = H * W
    mip = reduce == "max"
    kw_static = dict(ky=ky, zw=zw, zc=zc, precision=precision)

    def _run_fwd(vol, rays_tiled, starts, B):
        n_tiles = rays_tiled.shape[1] // TR
        rows = 2 if mip else 1
        if not resident and not mip:
            # Streaming sum-reduce: plane-major marching (one volume-plane
            # DMA per slab instead of ~n_tiles windows; see the kernel).
            out = _fwd_plane_major_call(
                vol, rays_tiled, starts, n_tiles=n_tiles, TR=TR,
                n_planes=n_planes, ky=ky, zw=zw, zc=zc,
                precision=precision, interpret=interpret)
            untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img)
            return untile(out), None
        kernel = functools.partial(_fwd_kernel, resident=resident,
                                   reduce=reduce, **kw_static)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=_common_specs(n_planes, TR) + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((rows, TR), lambda t: (0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, n_tiles * TR), jnp.float32),
            scratch_shapes=[
                _win_scratch(vol, ky, zw, False, resident),
                pltpu.VMEM((rows, TR), jnp.float32),
                _win_sems(),
            ],
            interpret=interpret,
            **_vmem_params(resident, vol),
        )(starts, rays_tiled, vol)
        untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img)
        if mip:
            return untile(out[0:1]), out[1:2]
        return untile(out), None

    def _vol(volume, prepped):
        return prepped if use_prepped else _prep_vol(
            volume, perm3, ky, zw, storage)

    @jax.custom_vjp
    def core(volume, rays_tiled, starts, prepped):
        B = rays_tiled.shape[1] // padded
        out, _ = _run_fwd(_vol(volume, prepped), rays_tiled, starts, B)
        return out

    def core_fwd(volume, rays_tiled, starts, prepped):
        B = rays_tiled.shape[1] // padded
        vol = _vol(volume, prepped)
        if fused and not mip:
            # Fused value+gradient march (see _fwdgrad_kernel): the rays
            # backward collapses to `rows * g`.
            n_tiles = rays_tiled.shape[1] // TR
            kernel = functools.partial(_fwdgrad_kernel, resident=resident,
                                       **kw_static)
            allrows = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=_common_specs(n_planes, TR) + [
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((_NROWS, TR), lambda t: (0, t),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_NROWS, n_tiles * TR),
                                               jnp.float32),
                scratch_shapes=[
                    _win_scratch(vol, ky, zw, False, resident),
                    pltpu.VMEM((_NROWS, TR), jnp.float32),
                    _win_sems(),
                ],
                interpret=interpret,
                **_vmem_params(resident, vol),
            )(starts, rays_tiled, vol)
            untile, _ = _tile_permutes(perm, B, N, TR, n_tiles_img)
            out = untile(allrows[_FG_VAL : _FG_VAL + 1])
            return out, (vol, rays_tiled, starts, None, allrows[:9])
        out, pbest = _run_fwd(vol, rays_tiled, starts, B)
        return out, (vol, rays_tiled, starts, pbest, None)

    def core_bwd(res, gc):
        vol, rays_tiled, starts, pbest, rows = res
        B = rays_tiled.shape[1] // padded
        n_tiles = rays_tiled.shape[1] // TR
        _, tile_g = _tile_permutes(perm, B, N, TR, n_tiles_img)
        g_tiled = tile_g(gc)
        mip_in = [pl.BlockSpec((1, TR), lambda t: (0, t),
                               memory_space=pltpu.VMEM)] if mip else []
        mip_args = (pbest,) if mip else ()

        if rows is not None:
            # Fused path: rows are g-independent (see _fwdgrad_kernel);
            # the rays cotangent is an elementwise product. The volume
            # cotangent below still runs its own kernel — XLA removes it
            # when d_vol is unused (pose-only registration).
            d_rays = jnp.concatenate(
                [rows * g_tiled,
                 jnp.zeros((_NROWS - 9, rows.shape[1]), jnp.float32)],
                axis=0)
        else:
            kernel = functools.partial(_bwd_rays_kernel, resident=resident,
                                       mip=mip, **kw_static)
            d_rays = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=_common_specs(n_planes, TR) + [
                    pl.BlockSpec((1, TR), lambda t: (0, t),
                                 memory_space=pltpu.VMEM),
                ] + mip_in + [
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((_NROWS, TR), lambda t: (0, t),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_NROWS, n_tiles * TR),
                                               jnp.float32),
                scratch_shapes=[
                    _win_scratch(vol, ky, zw, False, resident),
                    pltpu.VMEM((16, TR), jnp.float32),
                    _win_sems(),
                ],
                interpret=interpret,
                **_vmem_params(resident, vol),
            )(starts, rays_tiled, g_tiled, *mip_args, vol)

        dvol_init = jnp.zeros(vol.shape, jnp.float32)
        kernel = functools.partial(_bwd_vol_kernel, mip=mip, **kw_static)
        d_vol_p = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=_common_specs(n_planes, TR) + [
                pl.BlockSpec((1, TR), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
            ] + mip_in + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(vol.shape, jnp.float32),
            input_output_aliases={(5 if mip else 4): 0},
            scratch_shapes=[
                pltpu.VMEM((2, 1, ky, zw), jnp.float32),
                pltpu.VMEM((2, 1, ky, zw), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(starts, rays_tiled, g_tiled, *mip_args, vol, dvol_init)

        Y0, Z0 = dims[other[0]], dims[other[1]]
        d_vol = jnp.transpose(d_vol_p[:X, :Y0, :Z0], inv_perm3)
        d_prepped = (jnp.zeros_like(vol) if use_prepped
                     else jnp.zeros((0,), jnp.float32))
        return d_vol, d_rays, _int_zeros_cotangent(starts), d_prepped

    core.defvjp(core_fwd, core_bwd)
    return core


def siddon_pallas_raycast(
    volume: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    image_shape: Tuple[int, int],
    axis: int = 0,
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
    resident: Optional[bool] = None,
    reducefn: str = "sum",
    footprint_guard: bool = False,
    guard_pred=None,
    fallback=None,
    tile_subset=None,
    fused_pose_bwd: bool = True,
) -> jnp.ndarray:
    """Exact Siddon render via Pallas slab-march kernels, fwd + analytic bwd.

    Equivalent line integrals to :func:`diffdrr_tpu.ops.siddon.siddon_raycast`
    (the sort-based XLA oracle) for rays whose major direction component lies
    along ``axis`` (``max(|dy|,|dz|) <= |dx|`` per ray); see the module
    docstring for the decomposition and validity domain. Args mirror
    :func:`diffdrr_tpu.ops.pallas.joseph.joseph_pallas_raycast`, including
    the ``footprint_guard``/``guard_pred``/``fallback`` runtime dispatch
    (for Siddon, ``guard_pred`` typically carries the slab-validity bit).
    ``reducefn="max"`` runs forward AND backward in-kernel (argmax gating).
    """
    B, N, _ = target.shape
    if weights is None:
        weights = jnp.ones((B, 1, N), volume.dtype)
    if zc is None:
        zc = zw - 128 if zw > 128 else zw
    from .joseph import _padded_transverse, _validate_z_window
    _validate_z_window(volume.shape, axis, zw, zc)
    use_prepped = prepped_vol is not None
    resident = _resolve_resident(resident, volume, axis, ky, zw, False,
                                 storage, None, prepped_vol)
    if reducefn not in ("sum", "max"):
        raise ValueError(
            f"kernel path supports reducefn 'sum'/'max', got {reducefn!r}")
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
                            tile, voxel_shift, 1, eps, quadrature="siddon",
                            tile_subset=tile_subset)
    ret = _compute_starts(
        rays_tiled, B * n_tiles_packed, TR, dims[axis], 1, Yp, Zp, ky, zw,
        zc, with_fit=footprint_guard, y0=dims[other[0]], z0=dims[other[1]],
        quadrature="siddon",
    )
    starts, fits = ret if footprint_guard else (ret, None)

    core = _make_siddon(
        dims, tuple(image_shape), axis, voxel_shift, eps, tile, ky,
        zw, zc, precision, storage, interpret, use_prepped, resident,
        reducefn,
        **({} if tile_subset is None else {"tile_subset": tile_subset}),
        **({} if fused_pose_bwd else {"fused": False}),
    )
    prepped = prepped_vol if use_prepped else jnp.zeros((0,), jnp.float32)

    pred = fits
    if guard_pred is not None:
        pred = guard_pred if pred is None else (pred & guard_pred)
    if pred is None:
        return core(volume, rays_tiled, starts, prepped)
    return jax.lax.cond(
        pred,
        lambda op: core(op[0], op[1], op[2], prepped),
        lambda op: fallback(op[0], op[3], op[4], op[5]),
        (volume, rays_tiled, starts, source, target, weights),
    )
