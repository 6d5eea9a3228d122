"""2D/3D registration: recovering a camera pose from one X-ray.

The flagship workload (the reference's ``registration.ipynb`` +
``metrics.ipynb``): render a synthetic target X-ray at an unknown pose,
start from a perturbed initial guess, and drive the pose by gradient
ascent on image similarity until the estimate is within millimetres.

Run:  python tutorials/02_registration.py [--full] [--tpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

FULL = "--full" in sys.argv

from diffdrr_tpu import DRR, load_example_ct, convert
from diffdrr_tpu.metrics import (
    NormalizedCrossCorrelation2d,
    MultiscaleNormalizedCrossCorrelation2d,
    GradientNormalizedCrossCorrelation2d,
    MutualInformation,
    DoubleGeodesicSE3,
)
from diffdrr_tpu.registration import optimize, optimize_until

# ---------------------------------------------------------------------------
# 1. The problem: a ground-truth pose renders a target image; we only get the
# image and must recover the pose. Use the trilinear renderer with a modest
# n_points — fast forward/backward, smooth gradients.
# ---------------------------------------------------------------------------
subject = load_example_ct(shape=None if FULL else (96, 96, 48))
H = 128 if FULL else 48
drr = DRR(subject, sdd=1020.0, height=H, delx=800.0 / H, renderer="trilinear")

rot_true = jnp.array([[0.05, np.pi / 2 + 0.03, -0.02]])
trans_true = jnp.array([[10.0, 850.0, -5.0]])
target = drr(rot_true, trans_true, parameterization="euler_angles",
             convention="ZXY", n_points=200)
pose_true = convert(rot_true, trans_true,
                    parameterization="euler_angles", convention="ZXY")

# ---------------------------------------------------------------------------
# 2. Image similarity metrics. All of the reference's losses are available;
# multiscale NCC is the standard registration objective.
# ---------------------------------------------------------------------------
rot0 = rot_true + jnp.array([[0.03, -0.03, 0.02]])
trans0 = trans_true + jnp.array([[8.0, -6.0, 7.0]])
moving = drr(rot0, trans0, parameterization="euler_angles",
             convention="ZXY", n_points=200)


def norm01(x):
    # MutualInformation (like the reference's kornia histograms) expects
    # [0, 1]-range images; NCC variants are scale-invariant already.
    return (x - x.min()) / (x.max() - x.min())


for name, metric, prep in [
    ("NCC", NormalizedCrossCorrelation2d(), lambda x: x),
    ("multiscale NCC",
     MultiscaleNormalizedCrossCorrelation2d([None, 9], [0.5, 0.5]),
     lambda x: x),
    ("gradient NCC", GradientNormalizedCrossCorrelation2d(), lambda x: x),
    # MI magnitudes are small on background-dominated X-rays (the histogram
    # is one big air peak); what matters for registration is the ordering.
    ("mutual information", MutualInformation(sigma=0.01), norm01),
]:
    a, b = prep(target), prep(moving)
    print(f"{name:20s} target-vs-init {float(metric(a, b).squeeze()): .4f}  "
          f"target-vs-target {float(metric(a, a).squeeze()): .4f}")

# Pose-space error in millimetres (rotation geodesic scaled to the detector
# arm + translation distance) — the convergence criterion:
geo = DoubleGeodesicSE3(sdd=1020.0)
pose0 = convert(rot0, trans0, parameterization="euler_angles", convention="ZXY")
d0 = float(geo(pose_true, pose0)[2][0])
print(f"initial double-geodesic error: {d0:.1f} mm")

# ---------------------------------------------------------------------------
# 3. Iterative registration. `optimize` runs the whole loop on-device as one
# jitted lax.scan (no per-iteration host sync — critical on remote TPUs).
# Split learning rates for rotation/translation, like the reference's
# experiments. Optimizers: "adam", "sgd" (momentum/dampening), "lbfgs".
# ---------------------------------------------------------------------------
rot, trans, trace = optimize(
    drr, target, rot0, trans0, "euler_angles", "ZXY",
    n_iters=150 if FULL else 80,
    optimizer="adam", lr_rotation=2e-3, lr_translation=5e-1,
    n_points=200,
)
pose_est = convert(rot, trans, parameterization="euler_angles", convention="ZXY")
d_adam = float(geo(pose_true, pose_est)[2][0])
print(f"adam:  NCC {trace[0]:.4f} -> {trace[-1]:.4f}, error {d0:.1f} -> "
      f"{d_adam:.1f} mm in {len(trace)} iters")
assert trace[-1] > trace[0] and d_adam < d0 / 3

# ---------------------------------------------------------------------------
# 4. LBFGS refinement: second-order steps shine near the optimum (far from
# it, the mixed radian/millimetre parameter scales make line searches
# overshoot — the reference experiments see the same). The standard pattern
# is coarse Adam -> LBFGS polish.
# ---------------------------------------------------------------------------
rot_l, trans_l, trace_l = optimize(
    drr, target, rot, trans, "euler_angles", "ZXY",
    n_iters=15, optimizer="lbfgs", n_points=200,
)
pose_l = convert(rot_l, trans_l, parameterization="euler_angles", convention="ZXY")
d_lbfgs = float(geo(pose_true, pose_l)[2][0])
print(f"lbfgs polish: NCC {trace_l[0]:.4f} -> {trace_l[-1]:.4f}, error "
      f"{d_adam:.1f} -> {d_lbfgs:.1f} mm in {len(trace_l)} iters")
assert trace_l[-1] >= trace[-1] - 1e-4

# ---------------------------------------------------------------------------
# 5. Run-to-convergence: `optimize_until` wraps the loop in an on-device
# lax.while_loop with the mm criterion — zero host syncs until done.
# (In a real workload you do not know the true pose; here it demonstrates
# the reference experiments' "double geodesic < threshold" protocol.)
# ---------------------------------------------------------------------------
rot_u, trans_u, n_used, d_final = optimize_until(
    drr, target, rot0, trans0, "euler_angles", "ZXY",
    true_pose=pose_true, tol_mm=3.0 if FULL else 8.0,
    max_iters=300 if FULL else 150,
    optimizer="adam", lr_rotation=2e-3, lr_translation=5e-1, n_points=200,
)
print(f"optimize_until: {int(n_used)} iters, final error {float(d_final):.2f} mm")
assert float(d_final) < (3.0 if FULL else 8.0) or int(n_used) == (300 if FULL else 150)

# ---------------------------------------------------------------------------
# 6. Random restarts, batched. The reference's experiments loop over 100
# random initializations one at a time; on TPU the restarts are a batch
# axis — `optimize_multistart` renders all N candidate poses per iteration
# in ONE dispatch, and (elementwise optimizer + summed per-restart loss)
# is exactly N independent optimizations.
# ---------------------------------------------------------------------------
from diffdrr_tpu.registration import optimize_multistart

key_offsets_r = jnp.array([[0.02, -0.02, 0.01],
                           [-0.06, 0.05, -0.04],
                           [0.10, 0.08, -0.09]])
key_offsets_t = jnp.array([[5.0, -4.0, 3.0],
                           [-12.0, 9.0, -8.0],
                           [20.0, -15.0, 18.0]])
rots_ms, transs_ms, scores_ms, _ = optimize_multistart(
    drr, target, rot_true + key_offsets_r, trans_true + key_offsets_t,
    "euler_angles", "ZXY", n_iters=60 if FULL else 40,
    lr_rotation=2e-3, lr_translation=5e-1, n_points=200,
)
best = int(jnp.argmax(scores_ms))
pose_best = convert(rots_ms[best:best + 1], transs_ms[best:best + 1],
                    parameterization="euler_angles", convention="ZXY")
d_best = float(geo(pose_true, pose_best)[2][0])
print(f"multistart: scores {np.round(np.asarray(scores_ms), 3)}, "
      f"winner {best} at {d_best:.1f} mm")
assert float(scores_ms[best]) >= float(scores_ms.max()) - 1e-6

print("tutorial 02: all checks passed")
