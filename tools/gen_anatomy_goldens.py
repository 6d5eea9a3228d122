"""Generate direct torch-reference goldens on real anatomy (VERDICT r4 #5).

Produces ``tests/data/anatomy_goldens.npz``: full-frame renders and
end-to-end pose gradients computed by the ACTUAL reference chain — reference
``pose.convert`` -> reference ``Detector`` -> reference ``Siddon``/
``Trilinear`` renderers (/root/reference/diffdrr/renderers.py:34-89,
detector.py:145-154) — in float64 torch, on the synthesized-TotalSegmentator
CT (the bundled real scan is absent from the checkout; see
tests/test_real_anatomy_parity.py for why this substitute is the closest
executable real-anatomy geometry).

The Joseph renderer has no reference counterpart; its golden comes from an
independent torch-f64 implementation of the same quadrature spec
(plane-marching trapezoid, ops/joseph.py docstring) written here — torch
autograd supplies its gradients, so no JAX code is in that loop either.

The hardware test (tests/test_anatomy_goldens_tpu.py) asserts the Pallas
kernels against these goldens directly — no XLA-oracle middleman.

Run on CPU:  python tools/gen_anatomy_goldens.py
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
MASK = Path("/root/reference/diffdrr/data/mask.nii.gz")
CSV = Path("/root/reference/diffdrr/data/structures.csv")
OUT = REPO / "tests" / "data" / "anatomy_goldens.npz"

# Golden geometry: generic (off-grid-aligned) pose, full 64x64 frame.
SDD, HEIGHT, DELX = 1020.0, 64, 4.0
ROT = np.asarray([[0.02, np.pi / 2 + 0.03, -0.015]], np.float64)
TRANS = np.asarray([[5.0, 850.0, -8.0]], np.float64)
N_POINTS = 256  # reference-literal trilinear sample count


def build_anatomy_subject():
    """Deterministic real-anatomy subject (128 x 128 x 133). Shared with the
    hardware test so both sides render the same volume; the npz carries a
    density checksum to catch drift."""
    import pandas as pd

    from diffdrr_tpu.data import Image, read, synthesize_ct_from_labelmap
    from diffdrr_tpu.nifti import load as nifti_load

    mask_data, affine = nifti_load(MASK)
    mask_ds = np.ascontiguousarray(mask_data[::4, ::4, :])
    aff_ds = affine.copy()
    aff_ds[:3, 0] *= 4
    aff_ds[:3, 1] *= 4
    structures = pd.read_csv(CSV)
    hu = synthesize_ct_from_labelmap(mask_ds, structures)
    return read(Image(hu, aff_ds), Image(mask_ds, aff_ds), orientation="AP")


def density_digest(subject) -> str:
    d = np.ascontiguousarray(np.asarray(subject.density.data, np.float32))
    return hashlib.sha256(d.tobytes()).hexdigest()


# ---------------------------------------------------------------- torch side


def _torch_trilinear_sample(vol, idx):
    """Differentiable trilinear gather at fractional indices, zero padding.

    Same semantics as grid_sample(padding_mode="zeros", align_corners=False)
    after index unnormalization (see diffdrr_tpu/ops/sampling.py docstring),
    expressed independently in torch.
    """
    import torch

    d0, d1, d2 = vol.shape
    x, y, z = idx[..., 0], idx[..., 1], idx[..., 2]
    x0f, y0f, z0f = x.floor(), y.floor(), z.floor()
    fx, fy, fz = x - x0f, y - y0f, z - z0f
    out = torch.zeros_like(x)
    flat = vol.reshape(-1)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = x0f.long() + dx
                iy = y0f.long() + dy
                iz = z0f.long() + dz
                valid = ((ix >= 0) & (ix < d0) & (iy >= 0) & (iy < d1)
                         & (iz >= 0) & (iz < d2))
                ii = ((ix.clamp(0, d0 - 1) * d1 + iy.clamp(0, d1 - 1)) * d2
                      + iz.clamp(0, d2 - 1))
                v = flat[ii.reshape(-1)].reshape(ii.shape) * valid
                w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                     * (fz if dz else 1 - fz))
                out = out + v * w
    return out


def torch_joseph(vol, src, tgt, weights, axis, step=1, voxel_shift=0.5,
                 eps=1e-8, n_steps=None):
    """Joseph plane-march quadrature in torch f64 (spec: ops/joseph.py).

    One trilinear sample per voxel plane along ``axis`` (the sample's
    axis coordinate sits exactly on the plane), weighted by the parametric
    gap |step / d_axis| and the world ray length.
    """
    import torch

    dims = vol.shape
    X = dims[axis]
    off = voxel_shift - 0.5
    gs, gt = src + off, tgt + off
    d = gt - gs + eps
    if n_steps is None:
        n_steps = int(-(-X // step))
    ks = torch.arange(n_steps, dtype=vol.dtype) * step
    d_ax = d[..., axis]
    alpha_k = (ks[None, None, :] - gs[..., axis:axis + 1]) / d_ax[..., None]

    # Slab interval: reference _get_alpha_minmax semantics (incl. the
    # dims+1 upper plane and the [0, 1] clamp).
    dims_t = torch.tensor(dims, dtype=vol.dtype)
    sdd = tgt - src + eps
    a0 = (0.0 - voxel_shift - src) / sdd
    a1 = ((dims_t + 1.0) - voxel_shift - src) / sdd
    amin = torch.minimum(a0, a1).amax(-1, keepdim=True).clamp(min=0.0)
    amax = torch.maximum(a0, a1).amin(-1, keepdim=True).clamp(max=1.0)
    in_slab = (alpha_k >= amin) & (alpha_k <= amax)

    pts = gs[..., None, :] + alpha_k[..., None] * d[..., None, :]
    pts = pts.clone()
    pts[..., axis] = ks  # exact plane coordinate
    vals = _torch_trilinear_sample(vol, pts)
    dalpha = (step / d_ax).abs()[..., None]
    img = (vals * in_slab * dalpha).sum(-1)  # (B, N)
    return img[:, None, :] * weights


def main():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, "/root/reference")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    # The reference pose/detector modules import fastcore/roma (absent
    # here); install the same tiny pure-Python shims the parity suite uses
    # (tests/test_reference_parity.py::_install_reference_shims).
    import types

    if "fastcore.basics" not in sys.modules:
        fastcore = types.ModuleType("fastcore")
        basics = types.ModuleType("fastcore.basics")

        def patch(f):
            ann = f.__annotations__["self"]
            cls = f.__globals__[ann] if isinstance(ann, str) else ann
            setattr(cls, f.__name__, f)
            return f

        basics.patch = patch
        fastcore.basics = basics
        sys.modules["fastcore"] = fastcore
        sys.modules["fastcore.basics"] = basics
    if "roma" not in sys.modules:
        roma = types.ModuleType("roma")

        def is_orthonormal_matrix(R, epsilon=1e-5):
            I = torch.eye(3, dtype=R.dtype, device=R.device).expand_as(R)
            return torch.all(
                torch.abs(R @ R.transpose(-1, -2) - I) < epsilon)

        roma.is_orthonormal_matrix = is_orthonormal_matrix
        sys.modules["roma"] = roma

    from diffdrr.detector import Detector as RefDetector
    from diffdrr.pose import convert as ref_convert
    from diffdrr.renderers import Siddon as RefSiddon
    from diffdrr.renderers import Trilinear as RefTrilinear

    from diffdrr_tpu import DRR
    from diffdrr_tpu import convert as our_convert

    torch.set_default_dtype(torch.float64)

    subject = build_anatomy_subject()
    drr = DRR(subject, sdd=SDD, height=HEIGHT, delx=DELX)
    # March axis AT THE GOLDEN POSE (drr.march_axis is picked at the
    # identity pose; the golden pose's ~pi/2 rotation moves the principal
    # ray onto a different volume axis — marching the identity axis would
    # violate the Pallas slab-march bound, ratio ~1.5e5).
    pose_probe = our_convert(
        jnp.asarray(ROT, jnp.float32), jnp.asarray(TRANS, jnp.float32),
        parameterization="euler_angles", convention="ZXY")
    march_axis, ratio = drr.pallas_ray_compatibility(pose_probe)
    assert ratio <= 1.0, f"golden pose invalid for slab march: {ratio}"
    step = drr.joseph_steps[march_axis]
    density = np.asarray(subject.density.data, np.float32)
    digest = density_digest(subject)
    print(f"density {density.shape} sha256 {digest[:16]}… "
          f"march_axis {march_axis} step {step}")

    # --- reference geometry chain (torch, f64, differentiable) ---
    reorient = np.asarray(subject.reorient, np.float64)
    ref_det = RefDetector(SDD, HEIGHT, HEIGHT, DELX, DELX, 0.0, 0.0,
                          torch.from_numpy(reorient), reverse_x_axis=True)
    affine_inv = np.linalg.inv(np.asarray(subject.volume.affine, np.float64))

    rot_t = torch.from_numpy(ROT).requires_grad_(True)
    trans_t = torch.from_numpy(TRANS).requires_grad_(True)
    vol_t = torch.from_numpy(density.astype(np.float64)).requires_grad_(True)

    def geometry():
        pose = ref_convert(rot_t, trans_t, parameterization="euler_angles",
                           convention="ZXY")
        src_w, tgt_w = ref_det(pose, None)  # world space
        w = (tgt_w - src_w).norm(dim=-1)[:, None, :]  # reference drr.py:201
        A = torch.from_numpy(affine_inv)
        vs = src_w @ A[:3, :3].T + A[:3, 3]
        vt = tgt_w @ A[:3, :3].T + A[:3, 3]
        return src_w, tgt_w, vs, vt, w

    # Cross-check: the reference chain and OUR chain must emit the same
    # world rays at this pose (geometry parity is a test precondition).
    with torch.no_grad():
        src_w, tgt_w, *_ = geometry()
    our_pose = our_convert(jnp.asarray(ROT, jnp.float32),
                           jnp.asarray(TRANS, jnp.float32),
                           parameterization="euler_angles", convention="ZXY")
    our_src, our_tgt = drr.detector(our_pose, None)
    ray_err = max(
        float(np.abs(np.asarray(our_src) - src_w.numpy()).max()),
        float(np.abs(np.asarray(our_tgt) - tgt_w.numpy()).max()),
    )
    print(f"world-ray parity ours vs reference: max abs {ray_err:.2e} mm")
    assert ray_err < 5e-3, "geometry chains disagree; goldens would be moot"

    out = {
        "rot": ROT, "trans": TRANS,
        "sdd": SDD, "height": HEIGHT, "delx": DELX,
        "n_points": N_POINTS, "march_axis": march_axis, "step": step,
        "density_sha256": np.frombuffer(bytes.fromhex(digest), np.uint8),
        "affine_inv": affine_inv,
        "src_world": src_w.numpy(), "tgt_world": tgt_w.numpy(),
    }

    def record(name, render_fn, want_vol=True, want_pose=True):
        for t in (rot_t, trans_t, vol_t):
            if t.grad is not None:
                t.grad = None
        _, _, vs, vt, w = geometry()
        img = render_fn(vs, vt, w)
        img.sum().backward()
        out[f"{name}_img"] = img.detach().numpy()
        if want_pose:
            out[f"{name}_g_rot"] = rot_t.grad.numpy().copy()
            out[f"{name}_g_trans"] = trans_t.grad.numpy().copy()
        if want_vol:
            out[f"{name}_g_vol"] = (
                vol_t.grad.numpy()[::4, ::4, ::4].astype(np.float32))
        print(f"{name}: img mean {float(img.mean()):.4f}"
              + (f" |g_rot| {float(rot_t.grad.abs().max()):.4f}"
                 if want_pose else "")
              + (f" |g_vol| {float(vol_t.grad.abs().max()):.4f}"
                 if want_vol else ""))

    # Siddon pose grads: stop_gradients_through_grid_sample=True —
    # nearest-neighbor sample-position grads are 0 a.e., and the flag
    # matches the analytic VJP the Pallas kernel implements. The reference
    # wraps the whole voxel lookup in no_grad under this flag
    # (renderers.py:63-65), severing volume grads too — so volume-grad
    # goldens come from a second stop=False pass (identical volume math).
    sid = RefSiddon(stop_gradients_through_grid_sample=True)
    record("siddon", lambda vs, vt, w: sid(vol_t, vs, vt, w), want_vol=False)
    sid_vg = RefSiddon(stop_gradients_through_grid_sample=False)
    record("siddon_volgrad", lambda vs, vt, w: sid_vg(vol_t, vs, vt, w),
           want_pose=False)
    out["siddon_g_vol"] = out.pop("siddon_volgrad_g_vol")
    del out["siddon_volgrad_img"]

    # Trilinear, reference-literal placement (equispaced per-ray alphas,
    # renderers.py:219-225). The production Pallas kernel deliberately
    # places its n_points samples on fractional planes instead
    # (ops/pallas/raymarch.py design note) — so this golden gets a LOOSE
    # quadrature-agreement assertion only (the two placements integrate the
    # same piecewise-trilinear field; measured gap ~4e-3 on this anatomy).
    tri = RefTrilinear()
    record("trilinear_ref",
           lambda vs, vt, w: tri(vol_t, vs, vt, w, n_points=N_POINTS),
           want_vol=False, want_pose=False)

    # Trilinear golden at the KERNEL's own sample placement: fractional
    # stride h = (X-1)/(n_points-1) plane-marched in torch f64 — a tight,
    # independent golden for exactly what the kernel computes.
    X_axis = density.shape[march_axis]
    h_frac = (X_axis - 1) / (N_POINTS - 1)
    record("trilinear",
           lambda vs, vt, w: torch_joseph(vol_t, vs, vt, w, march_axis,
                                          step=h_frac, n_steps=N_POINTS))
    out["trilinear_h"] = h_frac

    record("joseph",
           lambda vs, vt, w: torch_joseph(vol_t, vs, vt, w, march_axis, step))

    # Sanity: the independent torch joseph must agree with our XLA oracle
    # (not used as the golden — used to catch a spec mistake in THIS file).
    from diffdrr_tpu.ops.joseph import joseph_raycast

    with torch.no_grad():
        _, _, vs, vt, w = geometry()
        ours = np.asarray(joseph_raycast(
            jnp.asarray(density), jnp.asarray(vs.numpy(), jnp.float32),
            jnp.asarray(vt.numpy(), jnp.float32),
            jnp.asarray(w.numpy(), jnp.float32),
            axis=march_axis, step=step))
        rel = (np.abs(ours - out["joseph_img"]).max()
               / np.abs(out["joseph_img"]).max())
        print(f"torch joseph vs XLA oracle rel {rel:.2e}")
        assert rel < 5e-4, "torch joseph spec drifted from ops/joseph.py"

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size / 1e3:.0f} kB)")


if __name__ == "__main__":
    main()
