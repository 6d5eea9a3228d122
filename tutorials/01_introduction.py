"""Introduction: rendering your first DRR.

Walkthrough of the core API (the reference's ``introduction.ipynb`` +
``trilinear.ipynb`` + ``geometry.ipynb`` ground): load a CT, build a
``DRR``, render from a pose, try all three renderers, and see how poses
are parameterized.

Run:  python tutorials/01_introduction.py [--full] [--tpu] [--plot]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

FULL = "--full" in sys.argv

# ---------------------------------------------------------------------------
# 1. Load a CT volume.
#
# `load_example_ct` returns a Subject: density volume (HU already mapped to
# linear attenuation), world affine, a labelmap of anatomic structures, and
# fiducials. Pass `shape=` to downsample for quick experiments. To load your
# own scan use `diffdrr_tpu.read("ct.nii.gz", ...)`.
# ---------------------------------------------------------------------------
from diffdrr_tpu import DRR, load_example_ct, convert

subject = load_example_ct(shape=None if FULL else (96, 96, 48))
print("volume:", subject.volume.data.shape, "spacing:", subject.volume.spacing)

# ---------------------------------------------------------------------------
# 2. Build the DRR renderer.
#
# The constructor mirrors the reference (sdd = source-to-detector distance in
# mm, height/width = detector pixels, delx/dely = pixel size in mm). The
# default renderer is exact Siddon; on TPU the render dispatches to fused
# Pallas kernels automatically.
# ---------------------------------------------------------------------------
H = 200 if FULL else 64
drr = DRR(subject, sdd=1020.0, height=H, delx=800.0 / H)

# ---------------------------------------------------------------------------
# 3. Pose and render.
#
# Poses are SE(3) transforms built from any of 9 parameterizations. The
# canonical AP view: rotate 90 deg about X (ZXY Euler), translate the source
# 850 mm along Y.
# ---------------------------------------------------------------------------
rotations = jnp.array([[0.0, np.pi / 2, 0.0]])
translations = jnp.array([[0.0, 850.0, 0.0]])
img = drr(rotations, translations, parameterization="euler_angles", convention="ZXY")
print("siddon DRR:", img.shape, "intensity range",
      float(img.min()), "-", float(img.max()))
assert img.shape == (1, 1, H, H) and float(img.max()) > 0

# The same pose as an explicit RigidTransform object:
pose = convert(rotations, translations,
               parameterization="euler_angles", convention="ZXY")
img2 = drr(pose)
assert np.allclose(np.asarray(img), np.asarray(img2))

# ---------------------------------------------------------------------------
# 4. The three renderers.
#
# * "siddon"    — exact radiological path length (reference Siddon).
# * "trilinear" — N equispaced trilinear samples per ray (reference
#                 Trilinear; `n_points` trades speed for accuracy).
# * "joseph"    — plane-marching with in-plane bilinear weights; the
#                 recommended TPU production renderer (no reference
#                 counterpart; converges to Siddon as step -> spacing).
# ---------------------------------------------------------------------------
imgs = {}
for name, kwargs in [("siddon", {}),
                     ("trilinear", {"n_points": 300}),
                     ("joseph", {})]:
    d = DRR(subject, sdd=1020.0, height=H, delx=800.0 / H, renderer=name)
    imgs[name] = np.asarray(
        d(rotations, translations, parameterization="euler_angles",
          convention="ZXY", **kwargs)
    )[0, 0]
    print(f"{name:10s} mean intensity {imgs[name].mean():8.3f}")

def ncc(a, b):
    a = (a - a.mean()) / a.std()
    b = (b - b.mean()) / b.std()
    return float((a * b).mean())

# All three agree on the image structure:
assert ncc(imgs["siddon"], imgs["trilinear"]) > 0.99
assert ncc(imgs["siddon"], imgs["joseph"]) > 0.99
print("renderer cross-correlations > 0.99: OK")

# ---------------------------------------------------------------------------
# 5. Pose parameterizations.
#
# Every parameterization converts differentiably to SE(3) — networks can
# regress any of them. Render the same physical pose from a quaternion:
# ---------------------------------------------------------------------------
quat, trans_cam = pose.convert("quaternion")
img_q = drr(quat, trans_cam, parameterization="quaternion")
assert np.allclose(np.asarray(img), np.asarray(img_q), atol=1e-3)
print("euler == quaternion render: OK")

# ---------------------------------------------------------------------------
# 6. Batched rendering: a batch of poses renders in one call (and shards
# across devices with diffdrr_tpu.parallel — see tutorial 04).
# ---------------------------------------------------------------------------
B = 4
rot_b = jnp.tile(rotations, (B, 1)) + 0.05 * jnp.arange(B)[:, None]
trans_b = jnp.tile(translations, (B, 1))
batch = drr(rot_b, trans_b, parameterization="euler_angles", convention="ZXY")
assert batch.shape == (B, 1, H, H)
print("batched render:", batch.shape)

if "--plot" in sys.argv:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from diffdrr_tpu.viz import plot_drr

    axs = plot_drr(batch, title=[f"pose {i}" for i in range(B)])
    plt.savefig("tutorial01_drrs.png", dpi=120)
    print("wrote tutorial01_drrs.png")

print("tutorial 01: all checks passed")
