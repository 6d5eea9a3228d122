"""Geometry: poses, the C-arm camera model, and projection round trips.

The reference's ``geometry.ipynb`` ground: how SE(3) poses are
parameterized and composed, how the detector turns a pose into rays, and
how to move between DRR conventions and standard computer-vision pinhole
cameras (for NeRF/3DGS-style pipelines).

Run:  python tutorials/05_geometry.py [--tpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.pose import RigidTransform, PARAMETERIZATIONS

# ---------------------------------------------------------------------------
# 1. Poses. `convert` builds a RigidTransform from any of 9 rotation
# parameterizations. Translations follow the reference's camera-center
# convention: the stored matrix translation is R @ t.
# ---------------------------------------------------------------------------
rot = jnp.array([[0.1, np.pi / 2, -0.05]])
trans = jnp.array([[10.0, 850.0, -20.0]])
pose = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
print("pose matrix:\n", np.asarray(pose.matrix[0]).round(3))

# Round-trip through every parameterization: convert out, convert back in,
# recover the same SE(3) matrix.
for param in PARAMETERIZATIONS:
    conv = "ZXY" if param == "euler_angles" else None
    r, t = pose.convert(param, convention=conv)
    back = convert(r, t, parameterization=param, convention=conv)
    err = float(jnp.abs(back.matrix - pose.matrix).max())
    print(f"  {param:22s} round-trip max err {err:.2e}")
    assert err < 5e-3, param  # f32 at ~850 mm translations

# Composition, inverse, and application to points:
delta = convert(jnp.array([[0.01, 0.0, 0.0]]), jnp.zeros((1, 3)),
                parameterization="axis_angle")
composed = pose.compose(delta)
identity = composed.compose(composed.inverse())
assert float(jnp.abs(identity.matrix - jnp.eye(4)).max()) < 1e-5
pts = jnp.array([[[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]]])
print("pose applied to points:", np.asarray(pose(pts)[0]).round(2))

# ---------------------------------------------------------------------------
# 2. The C-arm detector. A DRR owns a Detector: source at the origin of the
# canonical frame, detector plane sdd away, pixels delx/dely mm. The pose
# maps the canonical frame into world space.
# ---------------------------------------------------------------------------
subject = load_example_ct(shape=(48, 48, 24))
H = 32
drr = DRR(subject, sdd=1020.0, height=H, delx=8.0)
source, target = drr.detector(pose, None)
print("source:", np.asarray(source[0, 0]).round(2),
      "detector center:", np.asarray(target[0].mean(0)).round(2))
# Principal ray length == source-to-detector distance:
center = target[0].reshape(H, H, 3)[H // 2 - 1 : H // 2 + 1,
                                    H // 2 - 1 : H // 2 + 1].mean((0, 1))
assert abs(float(jnp.linalg.norm(center - source[0, 0])) - 1020.0) < drr.detector.delx
print("principal ray length == sdd: OK")

# ---------------------------------------------------------------------------
# 3. Projection round trip: world points -> pixels -> world. The DRR's
# perspective_projection/inverse_projection implement the reference's
# pixel conventions exactly (drr.py:269-312).
# ---------------------------------------------------------------------------
world = jnp.asarray(subject.fiducials, jnp.float32)  # (1, n_fiducials, 3)
pix = drr.perspective_projection(pose, world)
back = drr.inverse_projection(pose, pix)
# inverse_projection returns points ON the detector plane along each ray;
# they must project back to the same pixels.
pix2 = drr.perspective_projection(pose, back)
err = float(jnp.abs(pix - pix2).max())
print(f"pixel -> world -> pixel round trip err {err:.2e}")
assert err < 1e-2

# ---------------------------------------------------------------------------
# 4. The pinhole-camera bridge: recover standard CV intrinsics/extrinsics
# (K, R|t) for any DRR view — the interop path to NeRF/3DGS pipelines.
# ---------------------------------------------------------------------------
from diffdrr_tpu.utils import get_pinhole_camera

cam = get_pinhole_camera(drr, pose)
center = np.asarray(cam.center).ravel()
src = np.asarray(source[0, 0])
print("pinhole camera center vs ray source:", center.round(2), src.round(2))
assert np.abs(center - src).max() < 1.0

print("tutorial 05: all checks passed")
